"""URL pattern census (queries/crawl.py: url_pattern*).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
collapse kernel's shapes (digit runs, long hex runs, mixed), trap
dominance on a hand-built host, and cross-engine regex agreement on a
hex-bearing url (the case the synthetic corpus never exercises)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from readur_spark.queries.crawl import url_pattern, url_pattern_census


def _pat(spark, url: str) -> str:
    return spark.range(1).select(
        url_pattern(F.lit(url)).alias("p")
    ).first()["p"]


class TestCollapseKernel:
    def test_digit_runs_collapse(self, spark):
        assert (
            _pat(spark, "https://h.example/2024/01/page17.html")
            == "https://h.example/N/N/pageN.html"
        )

    def test_long_hex_collapses_before_digits(self, spark):
        sid = "a" * 16 + "0123456789abcdef"  # 32 hex chars
        assert (
            _pat(spark, f"https://h.example/s/{sid}/v2")
            == "https://h.example/s/H/vN"
        )

    def test_short_hex_left_alone(self, spark):
        assert _pat(spark, "https://h.example/deadbeef") == (
            "https://h.example/deadbeef"
        )

    def test_duckdb_twin_agrees_on_hex(self, spark):
        # the synthetic corpus has no 32+-char hex runs; pin the twin
        # regexes on one here so engine drift cannot hide
        url = "https://h.example/s/" + "ab12" * 8 + "/p/2024"
        got = duckdb.sql(
            "SELECT regexp_replace(regexp_replace('" + url + "',"
            " '[0-9a-f]{32,}', 'H', 'g'), '[0-9]+', 'N', 'g')"
        ).fetchone()[0]
        assert got == _pat(spark, url) == "https://h.example/s/H/p/N"


class TestCensus:
    def test_trap_dominance(self, spark):
        urls = spark.createDataFrame(
            [("h", "https://h/cal/2024/01/01"),
             ("h", "https://h/cal/2024/01/02"),
             ("h", "https://h/cal/2024/02/11"),
             ("h", "https://h/about")],
            "host string, url string",
        )
        rows = {r["pattern"]: r for r in url_pattern_census(urls).collect()}
        trap = rows["https://h/cal/N/N/N"]
        assert trap["n_urls"] == 3
        assert trap["host_urls"] == 4
        assert trap["top_pattern_n"] == 3
