"""Unit tests for the publication-date ladder — rung extraction,
precedence, calendar-validation fall-through, and the zero-Python
plan pin."""

from datetime import date

from pyspark.sql import functions as F

from readur_spark.ml.pubdate import (
    constructed_dated_pages,
    publication_dates,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in rows], "url string, html binary"
    )


def _one(spark, url, html):
    return publication_dates(_pages(spark, [(url, html)])).collect()[0]


class TestLadder:
    def test_meta_article(self, spark):
        r = _one(
            spark,
            "https://a/x",
            '<meta property="article:published_time" '
            'content="2021-03-04T10:00:00Z">',
        )
        assert (r["pub_date"], r["date_source"]) == (
            date(2021, 3, 4),
            "meta-article",
        )

    def test_meta_date_and_time_tag(self, spark):
        r = _one(spark, "https://a/x", '<meta name="date" content="2019-12-31">')
        assert (r["pub_date"], r["date_source"]) == (
            date(2019, 12, 31),
            "meta-date",
        )
        r = _one(spark, "https://a/x", '<time datetime="2020-06-15">June</time>')
        assert (r["pub_date"], r["date_source"]) == (
            date(2020, 6, 15),
            "time-tag",
        )

    def test_url_path_with_and_without_day(self, spark):
        r = _one(spark, "https://a/2018/07/22/post", "<p>x</p>")
        assert (r["pub_date"], r["date_source"]) == (
            date(2018, 7, 22),
            "url-path",
        )
        r = _one(spark, "https://a/2018/07/post", "<p>x</p>")
        assert (r["pub_date"], r["date_source"]) == (
            date(2018, 7, 1),
            "url-path",
        )

    def test_no_signal_is_null(self, spark):
        r = _one(spark, "https://a/about", "<p>no dates here</p>")
        assert r["pub_date"] is None and r["date_source"] is None

    def test_precedence_meta_beats_url(self, spark):
        r = _one(
            spark,
            "https://a/2001/01/01/post",
            '<meta property="article:published_time" content="2022-05-05">',
        )
        assert (r["pub_date"], r["date_source"]) == (
            date(2022, 5, 5),
            "meta-article",
        )

    def test_invalid_calendar_date_falls_through(self, spark):
        # month 15 fails try_to_date -> the url rung wins instead
        r = _one(
            spark,
            "https://a/2017/09/09/post",
            '<meta name="date" content="2020-15-40">',
        )
        assert (r["pub_date"], r["date_source"]) == (
            date(2017, 9, 9),
            "url-path",
        )

    def test_century_guard_rejects_bogus_years(self, spark):
        r = _one(spark, "https://a/1492/10/12/post", "<p>x</p>")
        assert r["pub_date"] is None

    def test_single_quoted_attributes(self, spark):
        r = _one(spark, "https://a/x", "<time datetime='2023-01-02'>x</time>")
        assert r["pub_date"] == date(2023, 1, 2)


class TestConstruction:
    def test_classes_cover_all_rungs(self, spark):
        docs = spark.createDataFrame(
            [(i, f"body {i}") for i in range(10)], "doc_id long, text string"
        )
        out = {
            r["url"]: r["date_source"]
            for r in publication_dates(constructed_dated_pages(docs)).collect()
        }
        assert sorted(set(out.values()) - {None}) == [
            "meta-article",
            "meta-date",
            "time-tag",
            "url-path",
        ]

    def test_time_decay_plan_exact_budget(self, spark):
        from readur_spark.ml.pubdate import (
            _TOKEN_BUDGET,
            mixture_time_decay_plan,
        )

        rows = mixture_time_decay_plan(spark, "/root/testdata/sf0.001").collect()
        assert sum(r["token_quota"] for r in rows) == _TOKEN_BUDGET
        years = {r["pub_year"] for r in rows}
        assert len(years) == 10  # the coprime multiplier spreads 2015-2024
        by_year = {r["pub_year"]: r["token_quota"] for r in rows}
        # one-year half-life: later years must never get SMALLER quotas
        # per token; spot-check the decay direction at the extremes
        assert by_year[max(years)] > by_year[min(years)]

    def test_pure_projection_no_python_no_shuffle(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (
            publication_dates(constructed_dated_pages(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan  # Catalyst end-to-end, zero UDFs
