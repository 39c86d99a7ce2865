"""Unit tests for integer HITS and co-citation — hand-computed
one-iteration values, ranking sanity, cap/dedup behavior."""

from readur_spark.ml.linkgraph import (
    HITS_SCALE,
    cocitation_pairs,
    hits_fixed_point,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


class TestHits:
    def test_one_iteration_hand_computed(self, spark):
        # graph: 1->2, 1->3, 4->2 ; n=4, h0 = scale//4 = 250000 each.
        # ar: 2 <- h1+h4 = 500000 ; 3 <- h1 = 250000 ; Sa = 750000
        # a:  2 = 500000*1e6 div 750000 = 666666 ; 3 = 333333
        # hr: 1 <- a2+a3 = 999999 ; 4 <- a2 = 666666 ; Sh = 1666665
        # h:  1 = 999999e6 div 1666665 = 600000 (exact: 1666665*6e5)
        #     4 = 666666e6 div 1666665 = 400000 (exact)
        out = {
            r["node"]: (r["authority"], r["hub"])
            for r in hits_fixed_point(
                _edges(spark, [(1, 2), (1, 3), (4, 2)]), 1
            ).collect()
        }
        assert out[2] == (666666, 0)
        assert out[3] == (333333, 0)
        assert out[1] == (0, 600000)
        assert out[4] == (0, 400000)

    def test_symmetric_cycle_is_uniform(self, spark):
        # 1->2->3->1: perfect symmetry, every node same authority/hub
        out = hits_fixed_point(
            _edges(spark, [(1, 2), (2, 3), (3, 1)]), 3
        ).collect()
        auths = {r["authority"] for r in out}
        hubs = {r["hub"] for r in out}
        assert len(auths) == 1 and len(hubs) == 1
        assert auths.pop() > 0

    def test_hub_authority_separation(self, spark):
        # bipartite: hubs {1,2} each link to authorities {10,11,12};
        # after convergence hubs have zero authority and vice versa,
        # and the doubly-linked authority outranks the singly-linked.
        pairs = [(1, 10), (1, 11), (1, 12), (2, 10)]
        out = {
            r["node"]: (r["authority"], r["hub"])
            for r in hits_fixed_point(_edges(spark, pairs), 3).collect()
        }
        assert out[1][0] == 0 and out[2][0] == 0
        assert out[10][1] == 0
        assert out[10][0] > out[11][0]  # two in-links beat one
        assert out[1][1] > out[2][1]  # linking the best authority more

    def test_empty_graph(self, spark):
        rows = hits_fixed_point(
            spark.createDataFrame([], "src long, dst long"), 2
        ).collect()
        assert rows == []

    def test_cocitation_hand_example(self, spark):
        # srcs 1,2,3 each cite {10,11}; src 4 cites {10,12}:
        # (10,11) co-cited 3x kept; (10,12) once -> below min_cocites
        pairs = [(s, t) for s in (1, 2, 3) for t in (10, 11)] + [
            (4, 10),
            (4, 12),
        ]
        out = {
            (r["node_a"], r["node_b"]): r["n_cocites"]
            for r in cocitation_pairs(_edges(spark, pairs)).collect()
        }
        assert out == {(10, 11): 3}

    def test_cocitation_parallel_links_count_once(self, spark):
        pairs = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11)]
        out = cocitation_pairs(_edges(spark, pairs)).collect()
        assert {(r["node_a"], r["node_b"], r["n_cocites"]) for r in out} == {
            (10, 11, 2)
        }

    def test_cocitation_megahub_capped(self, spark):
        # a hub citing 100 targets is excluded by the df cap; the two
        # modest srcs still produce their pair
        pairs = [(99, t) for t in range(100)] + [
            (1, 5),
            (1, 6),
            (2, 5),
            (2, 6),
        ]
        out = cocitation_pairs(_edges(spark, pairs)).collect()
        assert {(r["node_a"], r["node_b"]) for r in out} == {(5, 6)}

    def test_scores_on_scale_grid(self, spark):
        out = hits_fixed_point(
            _edges(spark, [(1, 2), (2, 1), (1, 3)]), 2
        ).collect()
        assert all(
            0 <= r["authority"] <= HITS_SCALE and 0 <= r["hub"] <= HITS_SCALE
            for r in out
        )


class TestTrustRankReciprocity:
    def test_trustrank_one_iteration_hand_computed(self, spark):
        from readur_spark.ml.linkgraph import SCALE, trustrank_fixed_point

        edges = _edges(spark, [(1, 2), (3, 1)])
        seeds = spark.createDataFrame([(1,)], "node long")
        out = {
            r["node"]: r["rank"]
            for r in trustrank_fixed_point(edges, seeds, 1).collect()
        }
        # seed 1: base only = 15% of scale (its in-link source 3 holds
        # zero trust); node 2 receives 85% of seed's full initial mass;
        # node 3: not a seed, no in-links -> exactly zero
        assert out[1] == 15 * SCALE // 100
        assert out[2] == 85 * SCALE // 100
        assert out[3] == 0

    def test_trustrank_empty_seed_set(self, spark):
        from readur_spark.ml.linkgraph import trustrank_fixed_point

        edges = _edges(spark, [(1, 2)])
        seeds = spark.createDataFrame([], "node long")
        out = trustrank_fixed_point(edges, seeds, 2).collect()
        assert all(r["rank"] == 0 for r in out)

    def test_trust_decays_with_distance(self, spark):
        from readur_spark.ml.linkgraph import trustrank_fixed_point

        # chain 1->2->3->4, seed 1: strictly decreasing trust
        edges = _edges(spark, [(1, 2), (2, 3), (3, 4)])
        seeds = spark.createDataFrame([(1,)], "node long")
        out = {
            r["node"]: r["rank"]
            for r in trustrank_fixed_point(edges, seeds, 4).collect()
        }
        assert out[2] > out[3] > out[4] > 0

    def test_reciprocity_hand_example(self, spark):
        from readur_spark.ml.linkgraph import reciprocity_stats

        # 1<->2 reciprocal; 1->3 one-way; self-loop 4->4 excluded
        edges = _edges(spark, [(1, 2), (2, 1), (1, 3), (4, 4), (4, 1)])
        out = {
            r["node"]: (r["outdeg"], r["n_reciprocal"], r["recip_pct"])
            for r in reciprocity_stats(edges).collect()
        }
        assert out[1] == (2, 1, 50)
        assert out[2] == (1, 1, 100)
        assert out[4] == (1, 0, 0)
        assert 3 not in out  # no outlinks -> no row

    def test_spam_mass_hand_example(self, spark):
        from readur_spark.ml.linkgraph import (
            pagerank_fixed_point,
            spam_mass,
            trustrank_fixed_point,
        )

        # seed 1 links 2; spam node 9 also links 2 heavily via 8,9
        edges = _edges(spark, [(1, 2), (8, 9), (9, 8), (8, 2), (9, 2)])
        seeds = spark.createDataFrame([(1,)], "node long")
        pr = pagerank_fixed_point(edges, 3)
        tr = trustrank_fixed_point(edges, seeds, 3)
        out = {r["node"]: r for r in spam_mass(pr, tr).collect()}
        # the reciprocal 8<->9 ring gets PageRank but zero trust
        assert out[8]["tr"] == 0 and out[8]["spam_mass_permille"] == 1000
        assert out[9]["tr"] == 0 and out[9]["spam_mass_permille"] == 1000
        # the seed itself is fully trusted relative to its PR share
        assert out[1]["spam_mass_permille"] < 1000
        assert all(0 <= r["spam_mass_permille"] <= 1000 for r in out.values())
