"""Redirect-chain pointer doubling (ml/redirects.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
resolution semantics on hand-built graphs (deep chain, loop, fan-in),
the log-round bound, and the plan (no Python, slim joins)."""

from __future__ import annotations

from readur_spark.ml.redirects import ROUNDS, resolve_redirects

SF = "/root/testdata/sf0.001"


def _resolve(spark, edges, rounds=ROUNDS):
    df = spark.createDataFrame(edges, "src_url string, dst_url string")
    return {
        r["src_url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, rounds).collect()
    }


class TestResolution:
    def test_chain_resolves_with_exact_hops(self, spark):
        got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
        assert got == {
            "a": ("d", 3, True),
            "b": ("d", 2, True),
            "c": ("d", 1, True),
        }

    def test_two_cycle_flagged_unresolved(self, spark):
        got = _resolve(spark, [("x", "y"), ("y", "x")])
        assert got["x"] == ("", 2**ROUNDS, False)
        assert got["y"] == ("", 2**ROUNDS, False)

    def test_fan_in_shares_terminal(self, spark):
        got = _resolve(spark, [("a", "t"), ("b", "t"), ("c", "a")])
        assert got["a"] == ("t", 1, True)
        assert got["b"] == ("t", 1, True)
        assert got["c"] == ("t", 2, True)

    def test_log_round_bound(self, spark):
        # depth-4 chain needs only 2 doubling rounds
        edges = [("u%d" % i, "u%d" % (i + 1)) for i in range(4)]
        got = _resolve(spark, edges, rounds=2)
        assert got["u0"] == ("u4", 4, True)


class TestPlanShape:
    def test_no_python(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["redirect_chain_resolve"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
