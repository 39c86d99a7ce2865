"""weighted_priority_sample — deterministic PPS bottom-k."""

from __future__ import annotations

import hashlib

from readur_spark.ml.webfilters import weighted_priority_sample


def _py_sample(rows, k):
    cand = []
    for doc_id, w, key in rows:
        if w is not None and w > 0:
            h = hashlib.md5(key.encode()).hexdigest()
            cand.append((int(h[:15], 16) // w, h, doc_id))
    cand.sort()
    return [d for _, _, d in cand[:k]]


ROWS = [
    (i, (i % 7) * 100 + (0 if i % 11 == 0 else 37), f"key-{i}")
    for i in range(120)
]  # mix of weights incl. zeros (i%7==0 and i%11==0 -> weight 0)


def _frame(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, w long, url string"
    )


class TestPrioritySample:
    def test_exact_vs_python(self, spark):
        got = [
            r["doc_id"]
            for r in weighted_priority_sample(
                _frame(spark), "w", "url", 25
            ).collect()
        ]
        assert got == _py_sample(ROWS, 25)

    def test_nonpositive_weight_excluded(self, spark):
        zero_ids = {d for d, w, _ in ROWS if w <= 0}
        got = {
            r["doc_id"]
            for r in weighted_priority_sample(
                _frame(spark), "w", "url", 120
            ).collect()
        }
        assert got.isdisjoint(zero_ids)

    def test_heavier_rows_win_proportionally(self, spark):
        rows = [(i, 10_000 if i < 100 else 1, f"u{i}") for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, w long, url string")
        winners = {
            r["doc_id"]
            for r in weighted_priority_sample(df, "w", "url", 50).collect()
        }
        heavy = sum(1 for d in winners if d < 100)
        assert heavy >= 45  # pps: heavy rows dominate the sample

    def test_plan_is_take_ordered(self, spark):
        out = weighted_priority_sample(_frame(spark), "w", "url", 10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
