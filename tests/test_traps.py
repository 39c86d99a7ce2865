"""Crawler-trap host detection (ml/traps.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
depth kernel, both trap flavors' verdicts, the threshold boundary,
and the zero-Python plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.traps import (
    TRAP_UPC_PERMILLE,
    constructed_trap_pages,
    crawl_trap_hosts,
    trap_host_census,
    url_path_depth,
)

SF = "/root/testdata/sf0.001"


def _depth(spark, url: str) -> int:
    return spark.range(1).select(
        url_path_depth(F.lit(url)).alias("d")
    ).first()["d"]


class TestDepthKernel:
    def test_query_string_excluded(self, spark):
        assert _depth(spark, "https://h.example/a/b?x=/y/z") == 2

    def test_root_is_zero(self, spark):
        assert _depth(spark, "https://h.example") == 0
        assert _depth(spark, "https://h.example/") == 0

    def test_trailing_slash_not_a_segment(self, spark):
        assert _depth(spark, "https://h.example/a/b/") == 2


class TestTrapVerdicts:
    def test_both_flavors_flag_others_do_not(self, spark):
        rows = crawl_trap_hosts(spark, SF).collect()
        verdict = {r["host"]: r for r in rows}
        assert verdict["src0.example"]["is_trap"]
        assert verdict["src1.example"]["is_trap"]
        for host, r in verdict.items():
            if host not in ("src0.example", "src1.example"):
                assert not r["is_trap"], host

    def test_path_trap_has_no_query_strings(self, spark):
        """src1 must flag via the content ratio ALONE — its query
        fraction is zero by construction, so a query-string heuristic
        cannot explain the verdict."""
        r = {
            x["host"]: x for x in crawl_trap_hosts(spark, SF).collect()
        }["src1.example"]
        assert r["query_frac_permille"] == 0
        assert r["upc_permille"] == 3000

    def test_session_trap_ratios(self, spark):
        r = {
            x["host"]: x for x in crawl_trap_hosts(spark, SF).collect()
        }["src0.example"]
        assert r["upc_permille"] == 5000
        # 4 of every 5 aliases carry ?session=k
        assert r["query_frac_permille"] == 800
        assert r["n_urls"] == 5 * r["n_content"]


class TestCensusSemantics:
    def test_threshold_boundary_inclusive(self, spark):
        # 5 urls over 2 contents = 2500 permille — exactly at the
        # threshold, must flag (>=, not >)
        rows = [
            ("h", f"https://h/x/{i}", f"d{i % 2}") for i in range(5)
        ]
        df = spark.createDataFrame(rows, ["host", "url", "digest"])
        out = trap_host_census(df).first()
        assert out["upc_permille"] == TRAP_UPC_PERMILLE
        assert out["is_trap"]

    def test_duplicate_fetches_collapse(self, spark):
        # the same URL fetched twice is one URL, not a trap signal
        rows = [("h", "https://h/p", "d0")] * 4
        df = spark.createDataFrame(rows, ["host", "url", "digest"])
        out = trap_host_census(df).first()
        assert out["n_urls"] == 1 and out["n_content"] == 1
        assert not out["is_trap"]


class TestPlan:
    def test_zero_python(self, spark):
        from readur_spark.queries.tables import load

        pages = constructed_trap_pages(load(spark, SF, "documents"))
        plan = trap_host_census(pages)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
