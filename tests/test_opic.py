"""OPIC importance (ml/opic.py).

Full DuckDB value-hash runs in test_entry_contract.py (every sweep
replayed); here: the cash machine hand-traced on a three-node graph,
exact conservation, the sink policy, and the slim-frame plan."""

from __future__ import annotations

from readur_spark.ml.opic import OPIC_TOTAL, opic_sweeps

SF = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


class TestSweeps:
    def test_hand_traced_two_sweeps(self, spark):
        # 0 -> {1, 2}, 1 -> 0, 2 is a sink; total 9 => 3 cash each.
        # sweep 1: h=(2,3,0), cash=(4,1,4)
        # sweep 2: h=(6,4,0), cash=(1,2,6)
        out = {
            r["node"]: r
            for r in opic_sweeps(
                _edges(spark, [(0, 1), (0, 2), (1, 0)]), 2, total=9
            ).collect()
        }
        assert (out[0]["cash"], out[0]["hist"]) == (1, 6)
        assert (out[1]["cash"], out[1]["hist"]) == (2, 4)
        assert (out[2]["cash"], out[2]["hist"]) == (6, 0)
        assert out[0]["importance"] == 7

    def test_cash_conserved_exactly(self, spark):
        edges = [(i, (i * 7 + 3) % 20) for i in range(20) for _ in range(2)]
        out = opic_sweeps(_edges(spark, edges), 5, total=1000).collect()
        n = len({r["node"] for r in out})
        assert sum(r["cash"] for r in out) == (1000 // n) * n

    def test_sink_accumulates(self, spark):
        # everything flows into the sink and stays there
        out = {
            r["node"]: r
            for r in opic_sweeps(
                _edges(spark, [(0, 2), (1, 2)]), 4, total=12
            ).collect()
        }
        assert out[2]["cash"] == 12  # both sources fully drained
        assert out[0]["cash"] == 0 and out[1]["cash"] == 0


class TestQuery:
    def test_conservation_at_fixture_scale(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["opic_importance"](spark, SF).collect()
        n = len(rows)
        assert sum(r["cash"] for r in rows) == (OPIC_TOTAL // n) * n
        assert all(r["importance"] == r["cash"] + r["hist"] for r in rows)

    def test_no_python_ops(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["opic_importance"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


class TestIncremental:
    def test_segment_joins_without_renormalization(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["opic_incremental"](spark, SF).collect()
        new = [r for r in rows if r["is_new"]]
        old = [r for r in rows if not r["is_new"]]
        assert new and old
        # 100 delta docs (doc_id % 5 == 0 of 500) joined the base 500
        assert len(new) == 100 and len(old) == 500
        # total cash = base allocation + the delta endowment, exactly
        from readur_spark.ml.opic import OPIC_TOTAL

        per_page = OPIC_TOTAL // 500
        assert sum(r["cash"] for r in rows) == per_page * 600
        # the new pages have started distributing: history flows
        assert any(r["hist"] > 0 for r in new)
