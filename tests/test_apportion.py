"""Largest-remainder budget apportionment (ml/apportion.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
exact-sum invariant, remainder election semantics, zero/negative
score handling, and determinism."""

from __future__ import annotations

from readur_spark.ml.apportion import apportion_budget


def _quotas(spark, rows, budget):
    df = spark.createDataFrame(rows, "host string, score long")
    return {
        r["host"]: r["quota"]
        for r in apportion_budget(df, budget).collect()
    }


class TestApportionment:
    def test_exact_sum_and_proportionality(self, spark):
        got = _quotas(spark, [("a", 50), ("b", 30), ("c", 20)], 10)
        assert sum(got.values()) == 10
        assert got == {"a": 5, "b": 3, "c": 2}

    def test_largest_remainder_wins_leftover(self, spark):
        # budget 10, S=3: floors 3,3,3 (rem 1,1,1) -> one seat, tie on
        # remainders broken by host name -> 'a'
        got = _quotas(spark, [("a", 1), ("b", 1), ("c", 1)], 10)
        assert sum(got.values()) == 10
        assert got == {"a": 4, "b": 3, "c": 3}

    def test_unequal_remainders(self, spark):
        # budget 7, scores 2,3,5 (S=10): floors 1,2,3 rem 4,1,5 ->
        # one seat -> host with rem 5
        got = _quotas(spark, [("x", 2), ("y", 3), ("z", 5)], 7)
        assert got == {"x": 1, "y": 2, "z": 4}

    def test_zero_and_negative_scores_get_zero(self, spark):
        got = _quotas(
            spark, [("a", 10), ("zero", 0), ("neg", -5)], 6
        )
        assert got == {"a": 6, "zero": 0, "neg": 0}

    def test_deterministic_rerun(self, spark):
        rows = [("h%02d" % i, 7 + (i * 13) % 31) for i in range(40)]
        a = _quotas(spark, rows, 997)
        b = _quotas(spark, rows, 997)
        assert a == b and sum(a.values()) == 997
