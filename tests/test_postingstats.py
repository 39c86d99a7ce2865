"""Posting compression accounting (ml/postingstats.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the two
Elias codes hand-checked against the published formulas, the dense-list
limit, and the shared-exchange plan."""

from __future__ import annotations

from readur_spark.ml.postingstats import (
    compression_by_df_bucket,
    posting_gap_bits,
)

SF = "/root/testdata/sf0.001"


def _postings(spark, pairs):
    return spark.createDataFrame(pairs, ["token", "doc_id"])


class TestEliasCodes:
    def test_hand_checked_bits(self, spark):
        # ids [0,1,3,7] -> gaps [1,1,2,4]
        # gamma: 1+1+3+5 = 10 ; delta: 1+1+4+5 = 11 ; raw: 4*64
        r = posting_gap_bits(
            _postings(spark, [("t", 0), ("t", 1), ("t", 3), ("t", 7)])
        ).first()
        assert r["df"] == 4 and r["raw_bits"] == 256
        assert r["gamma_bits"] == 10
        assert r["delta_bits"] == 11

    def test_dense_list_costs_one_bit_per_gap(self, spark):
        # consecutive ids: every gap is 1 -> gamma = delta = 1 bit each
        rows = [("t", i) for i in range(1, 65)]
        r = posting_gap_bits(_postings(spark, rows)).first()
        # first gap is id+1 = 2 (3 bits gamma, 4 delta); 63 unit gaps
        assert r["gamma_bits"] == 3 + 63
        assert r["delta_bits"] == 4 + 63
        assert r["gamma_bits"] < r["raw_bits"] // 20  # the point of it

    def test_bucket_rollup_partitions_tokens(self, spark):
        pairs = [("a", i) for i in range(8)] + [("b", 0)] + [("c", 5)]
        out = {r["df_log2_bucket"]: r for r in compression_by_df_bucket(
            posting_gap_bits(_postings(spark, pairs))).collect()}
        assert out[3]["n_tokens"] == 1   # df=8 -> bucket 3
        assert out[0]["n_tokens"] == 2   # two singletons
        assert out[0]["n_postings"] == 2


class TestPlan:
    def test_no_python_ops(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["postings_compression"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
