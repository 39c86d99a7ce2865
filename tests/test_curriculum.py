"""Curriculum interleaving (ml/curriculum.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: easy→hard
order within a shard, shard-assignment stability, stratification (each
shard samples the whole difficulty range), and the per-shard-window
plan shape."""

from __future__ import annotations

from readur_spark.ml.curriculum import N_SHARDS, curriculum_interleave

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestOrder:
    def test_rank_follows_words_per_sentence(self, spark):
        rows = [
            (1, "short one."),                          # 2 wps
            (2, "this one has five words."),            # 5 wps
            (3, "a b. c d."),                           # 2 wps (2 sents)
        ]
        out = curriculum_interleave(
            _docs(spark, rows), n_shards=1
        ).orderBy("rank_in_shard").collect()
        diffs = [r["difficulty_mwps"] for r in out]
        assert diffs == sorted(diffs)
        assert out[-1]["doc_id"] == 2  # hardest last

    def test_empty_docs_excluded(self, spark):
        out = curriculum_interleave(
            _docs(spark, [(1, ""), (2, "ok then.")]), n_shards=1
        ).collect()
        assert [r["doc_id"] for r in out] == [2]

    def test_shard_assignment_is_content_addressed(self, spark):
        rows = [(i, f"doc number {i}.") for i in range(40)]
        a = {r["doc_id"]: r["shard"]
             for r in curriculum_interleave(_docs(spark, rows)).collect()}
        b = {r["doc_id"]: r["shard"]
             for r in curriculum_interleave(
                 _docs(spark, list(reversed(rows)))).collect()}
        assert a == b  # input order never moves a doc between shards

    def test_ranks_dense_per_shard(self, spark):
        rows = [(i, f"w{i} sentence here.") for i in range(60)]
        out = curriculum_interleave(_docs(spark, rows)).collect()
        by_shard: dict[int, list[int]] = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["rank_in_shard"])
        for shard, ranks in by_shard.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1)), shard
        assert len(by_shard) > 1  # more than one shard populated


class TestPlan:
    def test_no_python_and_no_global_sort(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["curriculum_interleave"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        # the only ordering is the per-shard window partitioning —
        # a global ORDER BY would show a rangepartitioning exchange
        assert "rangepartitioning" not in plan.lower()
        assert N_SHARDS == 8
