"""Corpus drift census (ml/drift.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: TV
bounds and edge distributions, the injected-mover contract, shard
mergeability, and the zero-Python plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.drift import (
    MICRO,
    constructed_snapshot_docs,
    corpus_drift_movers,
    corpus_drift_tv,
    drift_summary,
    token_drift_frame,
)

SF = "/root/testdata/sf0.001"


def _frame(spark, rows):
    return token_drift_frame(
        spark.createDataFrame(rows, ["side", "text"])
    )


class TestTvEdges:
    def test_identical_snapshots_zero(self, spark):
        rows = [(0, "alpha beta gamma"), (1, "alpha beta gamma")]
        out = drift_summary(_frame(spark, rows)).first()
        assert out["tv_micro"] == 0
        assert out["n_types_shared"] == 3

    def test_disjoint_snapshots_saturate(self, spark):
        rows = [(0, "alpha beta"), (1, "gamma delta")]
        out = drift_summary(_frame(spark, rows)).first()
        # each side's probabilities sum to 10^6 exactly (2 x 500000);
        # disjoint support => TV = 10^6
        assert out["tv_micro"] == MICRO
        assert out["n_types_shared"] == 0

    def test_constructed_corpus_in_bounds(self, spark):
        out = corpus_drift_tv(spark, SF).first()
        assert 0 < out["tv_micro"] < MICRO
        assert out["n_types_shared"] > 0


class TestInjectedMover:
    def test_megaspam_leads_up(self, spark):
        top = corpus_drift_movers(spark, SF).first()
        assert top["token"] == "megaspam"
        assert top["direction"] == "up"
        assert top["p_a_micro"] == 0

    def test_movers_deterministic_order(self, spark):
        rows = corpus_drift_movers(spark, SF).collect()
        gaps = [r["gap_micro"] for r in rows]
        assert gaps == sorted(gaps, reverse=True)
        assert len(rows) == 10


class TestMergeability:
    def test_shard_counts_add(self, spark):
        """The (c_a, c_b) census of a union equals the sum of the
        shards' censuses — the property that makes per-dump rollups
        incremental."""
        docs = constructed_snapshot_docs(
            spark.read.parquet(f"{SF}/documents.parquet")
        ).withColumn("shard", F.monotonically_increasing_id() % 2)
        whole = token_drift_frame(docs).select("token", "c_a", "c_b")
        parts = None
        for s in (0, 1):
            p = token_drift_frame(docs.filter(F.col("shard") == s)).select(
                "token", "c_a", "c_b"
            )
            parts = p if parts is None else parts.unionByName(p)
        merged = parts.groupBy("token").agg(
            F.sum("c_a").alias("c_a"), F.sum("c_b").alias("c_b")
        )
        diff = whole.join(merged, "token", "full").filter(
            (whole["c_a"] != merged["c_a"]) | (whole["c_b"] != merged["c_b"])
        )
        assert diff.count() == 0


class TestPlan:
    def test_zero_python_and_broadcast_totals(self, spark):
        from readur_spark.queries.tables import load

        docs = constructed_snapshot_docs(load(spark, SF, "documents"))
        plan = (
            drift_summary(token_drift_frame(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BroadcastNestedLoopJoin" in plan  # 1-row totals frame
