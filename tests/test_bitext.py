"""Margin-based bitext mining (ml/bitext.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
margin formula on a hand-built candidate frame, forward-top-1
selection, the hubness property the ratio margin exists to fix, and
the zero-Python plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from readur_spark.ml.bitext import margin_pairs

SF = "/root/testdata/sf0.001"


def _cand(spark, rows):
    return spark.createDataFrame(rows, ["src_id", "dst_id", "sim"])


class TestMargin:
    def test_formula_exact(self, spark):
        # one source, three targets: top1 = (1, 10, 0.9);
        # k=2 NN mean of src = (0.9 + 0.5)/2 = 0.7; dst 10 has a single
        # candidate so its k-NN mean is 0.9.
        rows = [(1, 10, 0.9), (1, 11, 0.5), (1, 12, 0.1)]
        out = margin_pairs(_cand(spark, rows), k=2, threshold=1.05).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["src_id"], r["dst_id"]) == (1, 10)
        expected = 0.9 / ((0.7 + 0.9) / 2)
        assert r["margin"] == pytest.approx(round(expected, 3))
        assert r["keep"] == (expected >= 1.05)

    def test_hub_target_penalized(self, spark):
        # dst 10 is a hub: high sim to BOTH sources -> its k-NN mean is
        # high -> margins shrink; dst 11 is matched only by src 2.
        rows = [
            (1, 10, 0.80), (1, 11, 0.20),
            (2, 10, 0.78), (2, 11, 0.75),
        ]
        out = {r["src_id"]: r for r in
               margin_pairs(_cand(spark, rows), k=2).collect()}
        # both sources pick the hub as top-1 on raw cosine
        assert out[1]["dst_id"] == 10 and out[2]["dst_id"] == 10
        # hub denominator: knn_dst(10) = (0.80+0.78)/2 = 0.79 drags both
        # margins below the non-hub case
        assert out[1]["margin"] < 0.8 / ((0.5 + 0.2) / 2)

    def test_one_row_per_source(self, spark):
        rows = [(s, d, 0.1 * (d % 7) + 0.01 * s) for s in range(5)
                for d in range(10, 16)]
        out = margin_pairs(_cand(spark, rows)).collect()
        assert len(out) == 5
        assert sorted({r["src_id"] for r in out}) == [0, 1, 2, 3, 4]

    def test_tie_breaks_by_dst_id(self, spark):
        rows = [(1, 11, 0.5), (1, 10, 0.5)]
        r = margin_pairs(_cand(spark, rows), k=1).first()
        assert r["dst_id"] == 10


class TestPlan:
    def test_no_python_ops_and_checkpoint_cut(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["bitext_margin_mine"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        # the O(|A|·|B|) candidate scoring ran ONCE behind the eager
        # localCheckpoint — the final plan reads the slim materialized
        # top-k frame, not the cross join
        assert "ExistingRDD" in plan
        assert "BroadcastNestedLoopJoin" not in plan
