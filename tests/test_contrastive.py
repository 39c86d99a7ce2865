"""Unit tests for DPR-style hard-negative mining — hand-built vector
geometry exercising both thresholds, ranking, and the broadcast plan."""

import math

from readur_spark.ml.contrastive import hard_negatives


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestHardNegatives:
    def test_band_and_ranking(self, spark):
        # anchor 0 = x-axis. cos to (cosθ, sinθ) vectors is cosθ.
        def v(theta):
            return [float(math.cos(theta)), float(math.sin(theta)), 0.0]

        rows = [
            (0, [1.0, 0.0, 0.0]),     # anchor (id % 50 == 0)
            (1, v(0.1)),              # cos≈0.995 ≥ POS_T → excluded
            (2, v(0.9)),              # cos≈0.622 → hard negative
            (3, v(1.1)),              # cos≈0.454 → hard negative
            (4, v(1.5)),              # cos≈0.071 < NEG_T → excluded
            (5, [-1.0, 0.0, 0.0]),    # cos=-1 → excluded
        ]
        out = hard_negatives(_vecs(spark, rows), top_h=5).collect()
        got = [(r["neg_id"], r["rank"]) for r in out
               if r["anchor_id"] == 0]
        assert got == [(2, 1), (3, 2)]
        sims = {r["neg_id"]: r["sim"] for r in out if r["anchor_id"] == 0}
        assert abs(sims[2] - round(math.cos(0.9), 3)) <= 0.001

    def test_top_h_cap_and_tiebreak(self, spark):
        # six identical mid-band candidates → rank by vec_id, cap at 3
        rows = [(0, [1.0, 0.0])] + [
            (i, [0.5, float(math.sqrt(0.75))]) for i in range(1, 7)
        ]
        out = hard_negatives(_vecs(spark, rows), top_h=3).collect()
        got = [(r["neg_id"], r["rank"]) for r in sorted(
            out, key=lambda r: r["rank"]) if r["anchor_id"] == 0]
        assert got == [(1, 1), (2, 2), (3, 3)]

    def test_anchor_excludes_self_and_broadcast_plan(self, spark):
        rows = [(0, [1.0, 0.0]), (50, [1.0, 0.0]), (1, [0.6, 0.8])]
        df = hard_negatives(_vecs(spark, rows))
        assert all(r["anchor_id"] != r["neg_id"] for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "EvalPython" not in plan
