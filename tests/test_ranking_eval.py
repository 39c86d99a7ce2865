"""nDCG ranking evaluation (ml/ranking_eval.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
metric hand-computed, the perfect-ranking fixed point, truncation at
k, and the pruned-slice plan."""

from __future__ import annotations

from readur_spark.ml.ranking_eval import DCG_W, NDCG_K, ndcg_at_k

SF = "/root/testdata/sf0.001"


def _judged(spark, rows):
    return spark.createDataFrame(rows, ["query", "doc_id", "tf", "rel"])


class TestNdcg:
    def test_hand_computed(self, spark):
        # ranking (tf desc): B(rel1) C(rel2) A(rel3); ideal: A C B
        rows = [("q", 1, 1, 3), ("q", 2, 5, 1), ("q", 3, 3, 2)]
        r = ndcg_at_k(_judged(spark, rows)).first()
        assert r["dcg_micro"] == 1 * DCG_W[0] + 2 * DCG_W[1] + 3 * DCG_W[2]
        assert r["idcg_micro"] == 3 * DCG_W[0] + 2 * DCG_W[1] + 1 * DCG_W[2]
        assert r["ndcg_milli"] == (1000 * r["dcg_micro"]) // r["idcg_micro"]
        assert r["ndcg_milli"] == 789

    def test_perfect_ranking_scores_1000(self, spark):
        # rel increases with tf -> ranker order == ideal order
        rows = [("q", i, 10 - i, 3 - min(i, 2)) for i in range(6)]
        r = ndcg_at_k(_judged(spark, rows)).first()
        assert r["ndcg_milli"] == 1000

    def test_truncation_at_k(self, spark):
        # 15 unit-relevance docs: positions beyond K contribute nothing
        rows = [("q", i, 100 - i, 1) for i in range(15)]
        r = ndcg_at_k(_judged(spark, rows)).first()
        assert r["n_rel"] == 15
        assert r["dcg_micro"] == sum(DCG_W[:NDCG_K])
        assert r["ndcg_milli"] == 1000  # order among equals is ideal

    def test_fixture_queries_strictly_between(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["search_eval_ndcg"](spark, SF).collect()
        assert len(rows) == 3
        # the ranker is blind to the language component of relevance
        assert all(0 < r["ndcg_milli"] < 1000 for r in rows)


class TestPlan:
    def test_no_python_and_pruned_scan(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["search_eval_ndcg"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


class TestMrr:
    def test_first_full_grade_rank(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["search_eval_mrr"](spark, SF).collect()
        assert len(rows) == 3
        for r in rows:
            assert r["rr_micro"] == 1_000_000 // r["first_rel_rank"]
            assert r["first_rel_rank"] >= 1
