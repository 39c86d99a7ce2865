"""Adaptive revisit scheduling (queries/crawl.py: revisit_schedule).

Full DuckDB value-hash runs in test_entry_contract.py; here: the four
policy branches on a hand-built diff, both clamps, and the plan."""

from __future__ import annotations

import pytest

from readur_spark.queries.crawl import (
    DEFAULT_INTERVAL_S,
    MAX_INTERVAL_S,
    MIN_INTERVAL_S,
    revisit_schedule,
)

SF = "/root/testdata/sf0.001"


class TestPolicy:
    @pytest.fixture(scope="class")
    def result(self, spark):
        diff = spark.createDataFrame(
            [
                ("u_new", "added"),
                ("u_gone", "removed"),
                ("u_hot", "changed"),
                ("u_cold", "unchanged"),
                ("u_floor", "changed"),
                ("u_ceil", "unchanged"),
            ],
            "url string, status string",
        )
        sched = spark.createDataFrame(
            [
                ("u_gone", 7_200),
                ("u_hot", 7_200),
                ("u_cold", 7_200),
                ("u_floor", MIN_INTERVAL_S),
                ("u_ceil", MAX_INTERVAL_S),
            ],
            "url string, interval_s long",
        )
        return {
            r["url"]: (r["prev_interval_s"], r["next_interval_s"])
            for r in revisit_schedule(diff, sched).collect()
        }

    def test_added_starts_at_default(self, result):
        assert result["u_new"] == (None, DEFAULT_INTERVAL_S)

    def test_removed_leaves_schedule(self, result):
        assert result["u_gone"] == (7_200, 0)

    def test_changed_halves(self, result):
        assert result["u_hot"] == (7_200, 3_600)

    def test_unchanged_doubles(self, result):
        assert result["u_cold"] == (7_200, 14_400)

    def test_min_clamp(self, result):
        assert result["u_floor"][1] == MIN_INTERVAL_S

    def test_max_clamp(self, result):
        assert result["u_ceil"][1] == MAX_INTERVAL_S


class TestPlanShape:
    def test_slim_join_no_python(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["crawl_revisit_schedule"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        assert "Window" not in plan
