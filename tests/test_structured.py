"""Structured-metadata family (ml/structured.py): JSON-LD, Open Graph,
hreflang, RSS items, IBAN mod-97 — kernel behavior on hand-built pages
plus plan purity (the whole module must stay JVM-side)."""

import pytest
from pyspark.sql import functions as F

from readur_spark.ml.structured import (
    feed_items,
    feed_links,
    hreflang_table,
    iban_validate_de,
    jsonld_fields,
    og_fields,
)

SF = "/root/testdata/sf0.001"


def _pages(spark, page: str, url: str = "https://h.example/p.html"):
    return spark.createDataFrame([(url, page)], "url string, page string")


class TestJsonLd:
    def test_fields_extracted(self, spark):
        page = (
            '<head><script type="application/ld+json">'
            '{"@type":"Article","headline":"T","datePublished":"2024-02-03"}'
            "</script></head>"
        )
        row = jsonld_fields(_pages(spark, page)).collect()[0]
        assert (row.ld_type, row.headline, row.date_published) == (
            "Article", "T", "2024-02-03"
        )

    def test_no_block_yields_empty_sentinels(self, spark):
        row = jsonld_fields(_pages(spark, "<head></head>")).collect()[0]
        assert (row.ld_type, row.headline, row.date_published) == ("", "", "")

    def test_nongreedy_stops_at_first_close(self, spark):
        # a second, plain-JS script block must not extend the match
        page = (
            '<script type="application/ld+json">{"@type":"A"}</script>'
            '<script type="text/javascript">var x="</script>";</script>'
        )
        row = jsonld_fields(_pages(spark, page)).collect()[0]
        assert row.ld_type == "A"

    def test_missing_key_is_empty(self, spark):
        page = (
            '<script type="application/ld+json">{"@type":"A"}</script>'
        )
        row = jsonld_fields(_pages(spark, page)).collect()[0]
        assert row.headline == "" and row.date_published == ""


class TestOgAndFeed:
    def test_decoy_locale_never_matches(self, spark):
        page = (
            '<meta property="og:locale" content="de_DE">'
            '<meta property="og:title" content="Real">'
        )
        row = og_fields(_pages(spark, page)).collect()[0]
        assert row.og_title == "Real" and row.og_image == ""

    def test_feed_relative_resolution(self, spark):
        page = (
            '<link rel="alternate" type="application/rss+xml"'
            ' href="/feed.xml">'
        )
        row = feed_links(_pages(spark, page)).collect()[0]
        assert row.feed_url == "https://h.example/feed.xml"

    def test_feed_absolute_passthrough_and_absence(self, spark):
        page_abs = (
            '<link rel="alternate" type="application/rss+xml"'
            ' href="https://cdn.example/f.xml">'
        )
        assert (
            feed_links(_pages(spark, page_abs)).collect()[0].feed_url
            == "https://cdn.example/f.xml"
        )
        assert feed_links(_pages(spark, "<head></head>")).count() == 0


class TestHreflang:
    def test_decoy_hrefs_do_not_shift_zip(self, spark):
        page = (
            '<link rel="stylesheet" href="/s.css">'
            '<link rel="alternate" hreflang="en" href="https://a/en">'
            '<link rel="canonical" href="https://a/c">'
            '<link rel="alternate" hreflang="de" href="https://a/de">'
        )
        rows = {
            r.hreflang: r.alt_url
            for r in hreflang_table(_pages(spark, page)).collect()
        }
        assert rows == {"en": "https://a/en", "de": "https://a/de"}


class TestFeedItems:
    def test_channel_title_never_contaminates(self, spark):
        page = (
            "<rss><channel><title>Chan</title>"
            "<item><title>A</title><link>https://x/1</link>"
            "<pubDate>d1</pubDate></item>"
            "<item><title>B</title><link>https://x/2</link>"
            "<pubDate>d2</pubDate></item></channel></rss>"
        )
        rows = feed_items(_pages(spark, page)).orderBy("item_title").collect()
        assert [r.item_title for r in rows] == ["A", "B"]
        assert rows[0].feed_url == "https://h.example/p.html"
        assert rows[1].pub_date == "d2"


class TestIban:
    @pytest.mark.parametrize(
        "iban,expect",
        [
            # the ISO 13616 example German IBAN — known valid
            ("DE89370400440532013000", 1),
            # one check digit off — must fail
            ("DE88370400440532013000", 0),
        ],
    )
    def test_known_vectors(self, spark, iban, expect):
        df = spark.createDataFrame(
            [(f"pay {iban} now",)], "text string"
        )
        got, valid = iban_validate_de(F.col("text"))
        row = df.select(got.alias("i"), valid.alias("v")).collect()[0]
        assert row.i == iban and row.v == expect

    def test_word_boundary_rejects_longer_digit_runs(self, spark):
        # 21 digits after DE — not an IBAN token, regex must not match
        df = spark.createDataFrame(
            [("ref DE893704004405320130001 x",)], "text string"
        )
        got, _ = iban_validate_de(F.col("text"))
        assert df.select(got.alias("i")).collect()[0].i == ""


class TestPlanPurity:
    """The module's promise: zero Python in every registered query's
    physical plan — regexp/json/decimal intrinsics only."""

    @pytest.mark.parametrize(
        "key",
        [
            "jsonld_extract", "og_card_extract", "feed_autodiscovery",
            "hreflang_alternates", "hreflang_cluster_rollup",
            "feed_items_parse", "pii_iban_mod97",
        ],
    )
    def test_no_python_eval(self, spark, key):
        from readur_spark.queries.registry import queries

        plan = (
            queries()[key](spark, SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "MapInPandas" not in plan


class TestPaginationChains:
    def test_chain_of_three_with_orphan(self, spark):
        from readur_spark.ml.structured import pagination_chains

        def page(prev):
            p = '<head>'
            if prev:
                p += f'<link rel="prev" href="{prev}">'
            return p + '</head>'

        df = spark.createDataFrame(
            [
                ("https://x/a1", page(None)),
                ("https://x/a2", page("https://x/a1")),
                ("https://x/a3", page("https://x/a2")),
                ("https://x/solo", page(None)),
            ],
            "url string, page string",
        )
        got = {
            r.url: (r.chain_head, r.page_seq)
            for r in pagination_chains(df).collect()
        }
        assert got == {
            "https://x/a1": ("https://x/a1", 0),
            "https://x/a2": ("https://x/a1", 1),
            "https://x/a3": ("https://x/a1", 2),
            "https://x/solo": ("https://x/solo", 0),
        }


class TestMicrodataAndTitle:
    def test_microdata_absent_and_decoy(self, spark):
        from readur_spark.ml.structured import microdata_fields

        page = (
            '<body><span>decoy</span>'
            '<div itemscope itemtype="https://schema.org/Product">'
            '<span itemprop="name">Widget</span></div></body>'
        )
        row = microdata_fields(_pages(spark, page)).collect()[0]
        assert (row.item_type, row.item_name) == ("Product", "Widget")
        row2 = microdata_fields(
            _pages(spark, "<body><span>x</span></body>")
        ).collect()[0]
        assert (row2.item_type, row2.item_name) == ("", "")

    def test_title_precedence_jsonld_beats_og_beats_tag(self, spark):
        from readur_spark.ml.structured import title_consensus

        page = (
            '<script type="application/ld+json">{"headline":"J"}</script>'
            '<meta property="og:title" content="O">'
            "<title>T</title>"
        )
        row = title_consensus(_pages(spark, page)).collect()[0]
        assert (row.best_title, row.title_source) == ("J", "jsonld")
        page_og = '<meta property="og:title" content="O"><title>T</title>'
        row = title_consensus(_pages(spark, page_og)).collect()[0]
        assert (row.best_title, row.title_source) == ("O", "og")
        row = title_consensus(_pages(spark, "<title>T</title>")).collect()[0]
        assert (row.best_title, row.title_source) == ("T", "title_tag")
        row = title_consensus(_pages(spark, "<head></head>")).collect()[0]
        assert (row.best_title, row.title_source) == ("", "")
