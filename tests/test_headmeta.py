"""ml/headmeta.py — head metadata parse kernel + canonical collapse."""

from __future__ import annotations

from readur_spark.ml.headmeta import (
    canonical_collapse,
    head_metadata_table,
    parse_head_metadata,
)


URL = "https://h.example/a/b.html"


def _parse(html: str, url: str = URL):
    return parse_head_metadata(url, html.encode())


class TestKernel:
    def test_absolute_canonical(self):
        c, ni, nf, lang = _parse(
            '<html><head><link rel="canonical" '
            'href="https://h.example/c.html"></head><body>x</body></html>'
        )
        assert c == "https://h.example/c.html"
        assert (ni, nf, lang) == (0, 0, None)

    def test_relative_canonical_resolves(self):
        c, *_ = _parse(
            '<head><link rel="canonical" href="/c.html"></head>'
        )
        assert c == "https://h.example/c.html"

    def test_attribute_order_and_quoting(self):
        """href before rel, single quotes, unquoted values."""
        c, *_ = _parse(
            "<head><link href='/x' rel=canonical></head>"
        )
        assert c == "https://h.example/x"

    def test_rel_token_list(self):
        """rel is a space-separated token list per the HTML spec."""
        c, *_ = _parse(
            '<head><link rel="alternate canonical" href="/y"></head>'
        )
        assert c == "https://h.example/y"

    def test_first_canonical_wins(self):
        c, *_ = _parse(
            '<head><link rel="canonical" href="/one">'
            '<link rel="canonical" href="/two"></head>'
        )
        assert c == "https://h.example/one"

    def test_robots_tokens(self):
        _, ni, nf, _ = _parse(
            '<head><meta name="robots" content="NoIndex , nofollow">'
            "</head>"
        )
        assert (ni, nf) == (1, 1)
        _, ni, nf, _ = _parse(
            '<head><meta name="ROBOTS" content="noindex"></head>'
        )
        assert (ni, nf) == (1, 0)

    def test_first_robots_meta_wins(self):
        _, ni, nf, _ = _parse(
            '<head><meta name="robots" content="none-of-these">'
            '<meta name="robots" content="noindex"></head>'
        )
        assert (ni, nf) == (0, 0)

    def test_html_lang(self):
        *_, lang = _parse('<html lang="en-GB"><head></head>')
        assert lang == "en-GB"

    def test_body_tags_ignored(self):
        """A canonical link after </head> is not head metadata."""
        c, *_ = _parse(
            "<head></head><body>"
            '<link rel="canonical" href="/evil"></body>'
        )
        assert c is None

    def test_hostile_inputs(self):
        assert parse_head_metadata(URL, None) == (None, 0, 0, None)
        assert parse_head_metadata(URL, b"") == (None, 0, 0, None)
        assert _parse("<head><link rel=canonical></head>")[0] is None
        assert _parse(
            '<head><link rel="canonical" href="javascript:x()"></head>'
        )[0] is None
        # truncated tag, broken utf-8, no </head>
        assert _parse('<head><link rel="canonical" href="/ok')[0] is None
        assert parse_head_metadata(URL, b"\xff\xfe<head></head>") == (
            None, 0, 0, None,
        )


class TestTableAndCollapse:
    def _pages(self, spark, rows):
        return spark.createDataFrame(
            [(u, h.encode() if h is not None else None) for u, h in rows],
            "url string, html binary",
        )

    def test_collapse_merges_variants_and_drops_noindex(self, spark):
        pages = self._pages(
            spark,
            [
                ("https://h.example/p", '<head></head>'),
                (
                    "https://h.example/p?utm=1",
                    '<head><link rel="canonical" '
                    'href="https://h.example/p"></head>',
                ),
                (
                    "https://h.example/secret",
                    '<head><meta name="robots" content="noindex"></head>',
                ),
                ("https://h.example/q", "<head></head>"),
            ],
        )
        got = {
            r["canonical_target"]: (r["n_variants"], r["kept_url"])
            for r in canonical_collapse(
                head_metadata_table(pages)
            ).collect()
        }
        assert got["https://h.example/p"] == (2, "https://h.example/p")
        assert got["https://h.example/q"] == (1, "https://h.example/q")
        assert "https://h.example/secret" not in got

    def test_payload_crosses_python_once(self, spark):
        pages = self._pages(spark, [("https://h.example/p", "<head></head>")])
        plan = (
            head_metadata_table(pages)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("MapInPandas") == 1, plan
