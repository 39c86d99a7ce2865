"""Recency-decay weighting + PPS sample (ml/recency.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
bit-shift weight semantics on hand-built timestamps, the recency bias
of the winning set, and the plan shape (scalar-broadcast anchor, one
TakeOrdered, no window/Python)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from readur_spark.ml.recency import (
    HALF_LIFE_SEC,
    W_MAX,
    recency_sample,
    with_recency_weight,
)

SF = "/root/testdata/sf0.001"


def _frame(spark, offsets_sec):
    base = dt.datetime(2024, 6, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s)) for i, s in enumerate(offsets_sec)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")


class TestWeightKernel:
    def test_bucket_halving(self, spark):
        # newest -> 2^W_MAX; one half-life older -> half; far past -> 1
        offs = [
            3 * HALF_LIFE_SEC,           # newest (anchor)
            2 * HALF_LIFE_SEC,           # 1 half-life old
            0,                           # 3 half-lives old
            -(W_MAX + 5) * HALF_LIFE_SEC,  # beyond the cap
        ]
        got = {
            r["event_id"]: r["recency_w"]
            for r in with_recency_weight(_frame(spark, offs)).collect()
        }
        assert got[0] == 1 << W_MAX
        assert got[1] == 1 << (W_MAX - 1)
        assert got[2] == 1 << (W_MAX - 3)
        assert got[3] == 1

    def test_sub_halflife_age_keeps_full_weight(self, spark):
        offs = [HALF_LIFE_SEC, HALF_LIFE_SEC - 1]
        got = {
            r["event_id"]: r["recency_w"]
            for r in with_recency_weight(_frame(spark, offs)).collect()
        }
        assert got[0] == got[1] == 1 << W_MAX


class TestSampleBias:
    def test_winners_skew_recent(self, spark):
        from readur_spark.queries.tables import load

        events = load(spark, SF, "events")
        k = 40
        won = recency_sample(events, k).collect()
        assert len(won) == k
        # median winner weight must sit in the top few buckets: a
        # uniform sample would be dominated by weight-1 ancient rows
        weights = sorted(r["recency_w"] for r in won)
        assert weights[k // 2] >= 1 << (W_MAX - 4)

    def test_deterministic_rerun(self, spark):
        from readur_spark.queries.tables import load

        events = load(spark, SF, "events")
        a = {r["event_id"] for r in recency_sample(events, 25).collect()}
        b = {r["event_id"] for r in recency_sample(events, 25).collect()}
        assert a == b


class TestPlanShape:
    def test_takeordered_no_window_no_python(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["sample_recency_decay"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        assert "Window" not in plan
        assert "TakeOrderedAndProject" in plan
