"""operators/asof.py — distributed as-of join."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from readur_spark.operators.asof import asof_join
from readur_spark.plans.audit import shuffle_count


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", ts("2024-01-01T10:00:00")),  # after r2
            (2, "k1", ts("2024-01-01T08:30:00")),  # between r1 and r2
            (3, "k1", ts("2024-01-01T07:00:00")),  # before any ref
            (4, "k1", ts("2024-01-01T09:00:00")),  # EQUAL to r2 (inclusive)
            (5, "k2", ts("2024-01-01T12:00:00")),  # other key
            (6, "k3", ts("2024-01-01T12:00:00")),  # key with no refs
        ],
        "qid long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", ts("2024-01-01T08:00:00"), 100),  # r1
            ("k1", ts("2024-01-01T09:00:00"), 200),  # r2
            ("k2", ts("2024-01-01T11:00:00"), 300),
        ],
        "k string, ts timestamp, v long",
    )
    return left, right


class TestAsofJoin:
    def test_backward_inclusive_semantics(self, frames):
        left, right = frames
        out = asof_join(
            left, right, keys=["k"], ts_col="ts", right_value_cols=["v"]
        )
        got = {r["qid"]: (r["ref_v"], r["ref_ts"]) for r in out.collect()}
        assert got[1] == (200, ts("2024-01-01T09:00:00"))  # latest prior
        assert got[2] == (100, ts("2024-01-01T08:00:00"))  # skips later r2
        assert got[3] == (None, None)                      # nothing prior
        assert got[4] == (200, ts("2024-01-01T09:00:00"))  # equal ts matches
        assert got[5] == (300, ts("2024-01-01T11:00:00"))  # per-key isolation
        assert got[6] == (None, None)                      # key without refs

    def test_all_left_rows_survive(self, frames):
        left, right = frames
        out = asof_join(
            left, right, keys=["k"], ts_col="ts", right_value_cols=["v"]
        )
        assert out.count() == left.count()
        assert set(out.columns) == {"qid", "k", "ts", "ref_v", "ref_ts"}

    def test_single_shuffle_no_python(self, frames):
        left, right = frames
        out = asof_join(
            left, right, keys=["k"], ts_col="ts", right_value_cols=["v"]
        )
        # union -> ONE exchange on the keys -> window; no join fanout
        assert shuffle_count(out) == 1
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan
        assert "SortMergeJoin" not in plan and "BroadcastNestedLoop" not in plan

    def test_null_right_payload_carried_atomically(self, spark):
        """ADVICE r3: a matched right row whose value column is NULL
        must yield (NULL value, its own ts) — never an older row's
        value paired with the newer row's ts. The struct carry makes
        the match atomic per right row."""
        left = spark.createDataFrame(
            [(1, "k", ts("2024-01-01T10:00:00"))], "qid long, k string, ts timestamp"
        )
        right = spark.createDataFrame(
            [
                ("k", ts("2024-01-01T08:00:00"), 100),
                ("k", ts("2024-01-01T09:00:00"), None),  # latest match, NULL v
            ],
            "k string, ts timestamp, v long",
        )
        row = asof_join(
            left, right, keys=["k"], ts_col="ts", right_value_cols=["v"]
        ).collect()[0]
        assert row["ref_ts"] == ts("2024-01-01T09:00:00")
        assert row["ref_v"] is None

    def test_equal_ts_right_duplicates_deterministic(self, spark):
        """ADVICE r3: several right rows sharing (key, ts) resolve to
        the same carried match on every run — the struct itself is the
        window tiebreaker (max struct wins at equal ts)."""
        left = spark.createDataFrame(
            [(1, "k", ts("2024-01-01T10:00:00"))], "qid long, k string, ts timestamp"
        )
        dup = [("k", ts("2024-01-01T09:00:00"), v) for v in (7, 3, 9, 1)]
        vals = set()
        for n_part in (1, 3, 8):
            right = spark.createDataFrame(
                dup, "k string, ts timestamp, v long"
            ).repartition(n_part)
            row = asof_join(
                left, right, keys=["k"], ts_col="ts", right_value_cols=["v"]
            ).collect()[0]
            vals.add(row["ref_v"])
        assert vals == {9}  # max struct at the tied ts, every time

    def test_deterministic_under_repartition(self, frames):
        left, right = frames
        a = sorted(
            map(
                tuple,
                asof_join(
                    left, right, keys=["k"], ts_col="ts",
                    right_value_cols=["v"],
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                asof_join(
                    left.repartition(7), right.repartition(5),
                    keys=["k"], ts_col="ts", right_value_cols=["v"],
                ).collect(),
            )
        )
        assert a == b
