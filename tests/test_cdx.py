"""CDX(J) index tier (sources/cdx.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the SURT
urlkey kernel's hostile cases, the CDXJ parse round-trip (spaces in
the url field), fetch-span island edges, and the zero-Python plans.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.sources.cdx import (
    cdxj_line,
    fetch_spans,
    latest_capture,
    parse_cdxj,
    surt_urlkey,
)


def _key(spark, url: str) -> str:
    return spark.range(1).select(
        surt_urlkey(F.lit(url)).alias("k")
    ).first()["k"]


class TestSurtUrlkey:
    def test_canonical_everything(self, spark):
        assert (
            _key(
                spark,
                "https://WWW.Site.Example.COM:443/A/B"
                "?b=2&utm_source=x&a=1#frag",
            )
            == "com,example,site)/a/b?a=1&b=2"
        )

    def test_nondefault_port_survives(self, spark):
        assert _key(spark, "http://news.Host.ORG:8080/x") == (
            "org,host,news:8080)/x"
        )

    def test_default_port_http(self, spark):
        assert _key(spark, "http://a.b:80/p") == "b,a)/p"

    def test_empty_path_becomes_slash(self, spark):
        assert _key(spark, "https://example.com") == "com,example)/"

    def test_www_numeric_prefix(self, spark):
        assert _key(spark, "http://www2.example.com/p") == (
            "com,example)/p"
        )

    def test_www_inner_label_kept(self, spark):
        # only the LEADING www label is a mirror prefix
        assert _key(spark, "http://a.www.com/p") == "com,www,a)/p"

    def test_all_params_session(self, spark):
        # every param stripped -> no '?' at all
        assert _key(
            spark, "http://e.com/p?utm_campaign=z&gclid=1&fbclid=2"
        ) == "com,e)/p"

    def test_empty_params_dropped(self, spark):
        assert _key(spark, "http://e.com/p?&a=1&&b=2&") == (
            "com,e)/p?a=1&b=2"
        )

    def test_single_label_host(self, spark):
        assert _key(spark, "http://localhost/x") == "localhost)/x"

    def test_query_without_path(self, spark):
        assert _key(spark, "http://e.com?a=1") == "com,e)/?a=1"

    def test_zero_python_plan(self, spark):
        plan = (
            spark.range(4)
            .select(surt_urlkey(F.concat(F.lit("http://e.com/"),
                                         F.col("id"))).alias("k"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan and "MapInPandas" not in plan


class TestCdxjParse:
    def _line_df(self, spark, url: str):
        return spark.range(1).select(
            cdxj_line(
                surt_urlkey(F.lit(url)),
                F.lit("20230101000000"),
                F.lit(url),
                F.lit("text/html"),
                F.lit("200"),
                F.lit("sha1:ABC"),
                F.lit(1234),
                F.lit(5678),
                F.lit("f.warc.gz"),
            ).alias("line")
        )

    def test_round_trip_with_spaces_in_url(self, spark):
        # spaces live on in the JSON url field, but the urlkey escapes
        # them, so the 3-way split still frames the line correctly
        url = "http://e.com/a b c?q=x y"
        row = parse_cdxj(self._line_df(spark, url)).first()
        assert row["urlkey"] == "com,e)/a%20b%20c?q=x%20y"
        assert row["url"] == url
        assert row["capture_ts"] == "20230101000000"
        assert row["offset"] == 5678 and row["length"] == 1234
        assert row["filename"] == "f.warc.gz"
        assert row["digest"] == "sha1:ABC"

    def test_malformed_line_yields_nulls(self, spark):
        df = spark.createDataFrame([("only-urlkey",)], ["line"])
        row = parse_cdxj(df).first()
        assert row["offset"] is None and row["url"] is None

    def test_zero_python_plan(self, spark):
        plan = (
            parse_cdxj(self._line_df(spark, "http://e.com/"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan and "MapInPandas" not in plan


def _records(spark, rows):
    return spark.createDataFrame(
        rows, "filename string, offset long, length long"
    )


class TestFetchSpans:
    def test_adjacent_merge_and_split(self, spark):
        rows = [
            ("f", 0, 100),      # span 1: gap to next = 900 > 250
            ("f", 1000, 900),   # span 2: gap to next = 100 <= 250 -> merge
            ("f", 2000, 500),
            ("g", 0, 10),       # separate file -> own span
        ]
        out = {
            (r["filename"], r["span_start"]): r
            for r in fetch_spans(_records(spark, rows), gap=250).collect()
        }
        assert len(out) == 3
        s2 = out[("f", 1000)]
        assert s2["span_end"] == 2500
        assert s2["n_records"] == 2
        assert s2["payload_bytes"] == 1400
        assert s2["dead_bytes"] == 100
        assert out[("g", 0)]["n_records"] == 1

    def test_exact_gap_boundary_merges(self, spark):
        # hole == gap merges; hole == gap+1 splits
        rows = [("f", 0, 100), ("f", 350, 10), ("f", 611, 10)]
        spans = fetch_spans(_records(spark, rows), gap=250).collect()
        starts = sorted(s["span_start"] for s in spans)
        assert starts == [0, 611]

    def test_zero_python_plan(self, spark):
        plan = (
            fetch_spans(_records(spark, [("f", 0, 1)]))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan and "MapInPandas" not in plan


class TestLatestCapture:
    def test_newest_wins(self, spark):
        df = spark.createDataFrame(
            [
                ("k", "20230101000001", "u1", "d1", "text/html", "200"),
                ("k", "20230101000002", "u2", "d2", "text/html", "301"),
            ],
            "urlkey string, capture_ts string, url string, "
            "digest string, mime string, status string",
        )
        row = latest_capture(df).first()
        assert row["url"] == "u2" and row["status"] == "301"

    def test_one_row_per_urlkey(self, spark):
        df = spark.createDataFrame(
            [("k%d" % (i % 3), "2023010100000%d" % i, "u", "d", "m", "s")
             for i in range(9)],
            "urlkey string, capture_ts string, url string, "
            "digest string, mime string, status string",
        )
        assert latest_capture(df).count() == 3
