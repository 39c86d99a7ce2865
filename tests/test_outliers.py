"""Embedding outlier gate (ml/outliers.py).

The registered query's full DuckDB value-hash (Lloyd trajectory +
distances + flags) runs in test_entry_contract.py; here: flag
semantics on a hand-built frame, non-vacuity on the fixture corpus,
and the plan shape (no window, no Python, centroid join broadcast)."""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.outliers import (
    OUT_DEN,
    OUT_NUM,
    embedding_outliers,
    flag_outliers,
)

SF = "/root/testdata/sf0.001"


class TestFlagSemantics:
    def test_cross_multiplied_threshold(self, spark):
        # cluster 0: distances 10, 10, 40 -> mean 20; 40*16 > 20*17
        dists = spark.createDataFrame(
            [(1, 0, 10), (2, 0, 10), (3, 0, 40)],
            "vid long, cid long, d long",
        )
        got = {r["vid"]: r["is_outlier"] for r in flag_outliers(dists).collect()}
        assert got == {1: False, 2: False, 3: True}
        assert (OUT_NUM, OUT_DEN) == (17, 16)

    def test_integer_mean_matches_div(self, spark):
        dists = spark.createDataFrame(
            [(1, 0, 7), (2, 0, 8)], "vid long, cid long, d long"
        )
        rows = flag_outliers(dists).collect()
        assert all(r["mean_d"] == 15 // 2 for r in rows)


class TestEndToEnd:
    def test_nonvacuous_and_row_complete(self, spark):
        from readur_spark.queries.tables import load

        out = embedding_outliers(load(spark, SF, "embeddings")).collect()
        n_out = sum(1 for r in out if r["is_outlier"])
        assert len(out) == load(spark, SF, "embeddings").count()
        assert 0 < n_out < len(out) / 4  # a small but real tail

    def test_plan_no_window_no_python(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["embedding_outlier_flags"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan
