"""Connected components: hand-built graphs with known answers, plus
convergence on a chain (worst-case diameter)."""

from __future__ import annotations

from readur_spark.ml.components import component_summary, connected_components


def _labels(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {r.id: r.comp for r in connected_components(df, **kw).collect()}


def test_two_cliques_and_a_bridge(spark):
    # {1,2,3} clique, {10,11} pair, bridge 3-10 merges them; {20,21} apart
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (3, 10), (20, 21)]
    got = _labels(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20}


def test_chain_converges_to_min(spark):
    # worst-case diameter: a path 0-1-2-…-9 must all label 0
    pairs = [(i, i + 1) for i in range(9)]
    got = _labels(spark, pairs)
    assert set(got.values()) == {0}
    assert len(got) == 10


def test_direction_irrelevant(spark):
    got_fwd = _labels(spark, [(5, 9), (9, 12)])
    got_rev = _labels(spark, [(9, 5), (12, 9)])
    assert got_fwd == got_rev == {5: 5, 9: 5, 12: 5}


def test_component_summary_sizes(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    labels = connected_components(df)
    sizes = {r.comp: r.cluster_size for r in component_summary(labels).collect()}
    assert sizes == {1: 3, 10: 2}


class TestKeepBestPerComponent:
    def test_longest_wins_tie_breaks_by_id(self, spark):
        from readur_spark.ml.components import keep_best_per_component

        labels = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "id long, comp long"
        )
        quality = spark.createDataFrame(
            [(1, 10), (2, 40), (3, 40), (7, 5), (8, 5)],
            "id long, n_chars long",
        )
        rows = {
            r["id"]: r["keep"]
            for r in keep_best_per_component(labels, quality).collect()
        }
        # comp 1: 2 and 3 tie at 40 -> min id 2 wins; comp 7: tie -> 7
        assert rows == {1: 0, 2: 1, 3: 0, 7: 1, 8: 0}

    def test_exactly_one_keeper_per_cluster(self, spark):
        from readur_spark.ml.components import neardup_keep_longest

        out = neardup_keep_longest(spark, "/root/testdata/sf0.01")
        import pyspark.sql.functions as F

        per = out.groupBy("cluster_id").agg(F.sum("keep").alias("k"))
        assert per.filter(F.col("k") != 1).count() == 0
        assert out.count() > 0
