"""RSS/Atom feed parsing (sources/feeds.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: both
wire formats' kernels on hand-built feeds, null ladders for missing
or garbage fields, timestamp round trips, and the zero-Python plan."""

from __future__ import annotations

import datetime

from readur_spark.sources.feeds import constructed_feeds, feed_items

SF = "/root/testdata/sf0.001"

RSS = (
    '<rss version="2.0"><channel><title>blog</title>'
    "<item><title>Hello</title><link>https://h.example/a</link>"
    "<pubDate>02 Jan 2006 15:04:05 GMT</pubDate></item>"
    "<item><title>NoDate</title><link>https://h.example/b</link></item>"
    "</channel></rss>"
)
ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom"><title>blog</title>'
    '<entry><title>Alpha</title><link href="https://h.example/x"/>'
    "<updated>2024-03-05T08:30:07Z</updated></entry>"
    "<entry><title>NoLink</title>"
    "<updated>2024-03-06T08:30:07Z</updated></entry></feed>"
)


def _rows(spark, xml: str):
    df = spark.createDataFrame([("h.example", xml)], ["feed_host", "xml"])
    return sorted(
        feed_items(df).collect(), key=lambda r: (r["title"] or "")
    )


class TestRssKernel:
    def test_items_and_fields(self, spark):
        rows = _rows(spark, RSS)
        assert [r["title"] for r in rows] == ["Hello", "NoDate"]
        assert rows[0]["item_url"] == "https://h.example/a"
        assert rows[0]["kind"] == "rss"
        assert rows[0]["pub_ts"] == datetime.datetime(2006, 1, 2, 15, 4, 5)

    def test_missing_pubdate_is_null(self, spark):
        rows = _rows(spark, RSS)
        assert rows[1]["pub_ts"] is None
        assert rows[1]["item_url"] == "https://h.example/b"


class TestAtomKernel:
    def test_href_link_and_iso_ts(self, spark):
        rows = _rows(spark, ATOM)
        assert rows[0]["kind"] == "atom"
        assert rows[0]["item_url"] == "https://h.example/x"
        assert rows[0]["pub_ts"] == datetime.datetime(2024, 3, 5, 8, 30, 7)

    def test_missing_link_is_null(self, spark):
        rows = _rows(spark, ATOM)
        assert rows[1]["title"] == "NoLink"
        assert rows[1]["item_url"] is None


class TestHostileShapes:
    def test_empty_or_garbage_feed_yields_zero_rows(self, spark):
        for xml in ("", "not xml at all", "<rss><channel></channel></rss>"):
            assert _rows(spark, xml) == []

    def test_garbage_date_falls_to_null(self, spark):
        xml = (
            "<rss><channel><item><title>T</title>"
            "<link>https://h/x</link>"
            "<pubDate>yesterday-ish</pubDate></item></channel></rss>"
        )
        rows = _rows(spark, xml)
        assert rows[0]["pub_ts"] is None


class TestConstructedRoundTrip:
    def test_two_items_per_doc_both_formats(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = feed_items(constructed_feeds(docs))
        n_docs = docs.count()
        assert out.count() == 2 * n_docs
        kinds = {r["kind"] for r in out.select("kind").distinct().collect()}
        assert kinds == {"rss", "atom"}
        assert out.filter("pub_ts IS NULL OR item_url IS NULL").count() == 0


class TestPlan:
    def test_zero_python(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            feed_items(constructed_feeds(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
