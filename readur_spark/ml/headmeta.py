"""HTML <head> metadata: rel=canonical, robots meta, html lang.

Web-scale curation needs the head signals long before main-content
extraction: `<link rel="canonical">` collapses URL variants of the
same page (the standard pre-crawl dedup signal — tracking-parameter
and mirror variants all point at one canonical target),
`<meta name="robots" content="noindex...">` is a publisher opt-out the
pipeline must honor, and `<html lang>` is the cheapest language hint
available. The reference engine ingests files, not web pages, so it
has no analogue (nearest: mime sniffing, src/mime_detection.rs); this
is crawl-tier extension surface alongside `ml/robots.py` and
`queries/crawl.py`.

Kernel + operators:
  - `parse_head_metadata` — pure-Python head parse (regex tag scan +
    attribute pairs; bounded to the head section / first 64 KiB, so a
    pathological page costs O(head), not O(page));
  - `head_metadata_table` — the kernel over a slim (url, html)
    projection in ONE Arrow-batched mapInPandas (payload crosses the
    Python boundary once, never shuffles);
  - `canonical_collapse` — group variants by coalesce(canonical, url),
    drop noindex pages, keep the lexicographically-first variant: a
    slim-string aggregate, map-side combinable.

Correctness: the registered queries build REAL HTML pages from the
driver's `documents` table by a deterministic construction rule
(variant urls with canonical back-links every 3rd doc, relative
self-canonicals every 5th, robots noindex/nofollow every 7th), parse
them with the kernel, and the DuckDB oracle re-derives the expected
output from the same rule in pure SQL — if the parser mis-reads any
tag the value hash diverges. Hostile-input robustness is pinned in
tests/test_headmeta.py.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional
from urllib.parse import urljoin, urlparse

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

HEAD_SCAN_CAP = 65536

_HEAD_END_RE = re.compile(r"</head\s*>", re.IGNORECASE)
_TAG_RE = re.compile(r"<(link|meta|html)\b[^>]*>", re.IGNORECASE)
_ATTR_RE = re.compile(
    r"([a-zA-Z-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))"
)


def _attrs(tag: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _ATTR_RE.finditer(tag):
        key = m.group(1).lower()
        if key not in out:
            out[key] = next(g for g in m.groups()[1:] if g is not None)
    return out


def parse_head_metadata(
    page_url: str, html: bytes | None
) -> tuple[Optional[str], int, int, Optional[str]]:
    """(canonical_url, noindex, nofollow, html_lang) from the page
    head. Canonical hrefs resolve against the page url (relative
    canonicals are common); the first matching tag of each kind wins,
    as in browsers. Only the head section (or the first 64 KiB if
    </head> never appears) is scanned."""
    if not html:
        return None, 0, 0, None
    text = html[: HEAD_SCAN_CAP * 4].decode("utf-8", "replace")
    m = _HEAD_END_RE.search(text)
    head = text[: m.start()] if m else text[:HEAD_SCAN_CAP]

    canonical: Optional[str] = None
    noindex = 0
    nofollow = 0
    lang: Optional[str] = None
    robots_seen = False
    for tm in _TAG_RE.finditer(head):
        kind = tm.group(1).lower()
        a = _attrs(tm.group(0))
        if kind == "link" and canonical is None:
            rel = a.get("rel", "").lower().split()
            href = a.get("href", "").strip()
            if "canonical" in rel and href:
                try:
                    absolute = urljoin(page_url, href)
                except ValueError:
                    continue
                if urlparse(absolute).scheme in ("http", "https"):
                    canonical = absolute
        elif kind == "meta" and not robots_seen:
            if a.get("name", "").lower() == "robots":
                robots_seen = True
                tokens = {
                    t.strip().lower()
                    for t in a.get("content", "").split(",")
                }
                noindex = int("noindex" in tokens)
                nofollow = int("nofollow" in tokens)
        elif kind == "html" and lang is None:
            if "lang" in a:
                lang = a["lang"]
    return canonical, noindex, nofollow, lang


def head_metadata_table(pages: DataFrame) -> DataFrame:
    """(url, canonical_url, noindex, nofollow, html_lang) — the kernel
    over a slim (url, html) projection, one Arrow pass."""
    slim = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [
                (url,)
                + parse_head_metadata(
                    url, bytes(h) if h is not None else None
                )
                for url, h in zip(batch["url"], batch["html"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "canonical_url", "noindex", "nofollow",
                    "html_lang",
                ],
            )

    return slim.mapInPandas(
        run,
        schema=(
            "url string, canonical_url string, noindex int, "
            "nofollow int, html_lang string"
        ),
    )


def canonical_collapse(meta: DataFrame) -> DataFrame:
    """(canonical_target, n_variants, kept_url): variants grouped on
    coalesce(canonical, url), noindex pages honored (excluded), the
    lexicographically-first variant kept — content-addressed, so the
    winner is stable under any partitioning."""
    return (
        meta.filter(F.col("noindex") == 0)
        .groupBy(
            F.coalesce(F.col("canonical_url"), F.col("url")).alias(
                "canonical_target"
            )
        )
        .agg(
            F.count("*").alias("n_variants"),
            F.min("url").alias("kept_url"),
        )
    )


# ---- deterministic page construction (both engines replay it) ----------


def _variant_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real HTML pages derived from `documents` by a fixed rule:
    base page per doc (relative self-canonical when doc_id%5=0, robots
    noindex,nofollow when doc_id%7=0, html lang always); a tracking-
    parameter variant with an absolute canonical back-link when
    doc_id%3=0 (robots meta inherited from the same head template)."""
    docs = load(spark, sf_dir, "documents")
    base_url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/doc"),
        F.col("doc_id").cast("string"), F.lit(".html"),
    )
    robots = F.when(
        F.col("doc_id") % 7 == 0,
        F.lit('<meta name="robots" content="noindex,nofollow">'),
    ).otherwise(F.lit(""))
    self_canon = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit('<link rel="canonical" href="/doc'),
            F.col("doc_id").cast("string"), F.lit('.html">'),
        ),
    ).otherwise(F.lit(""))
    head_open = F.concat(
        F.lit('<html lang="'), F.col("lang"),
        F.lit('"><head><title>d</title>'),
    )
    tail = F.lit("</head><body>x</body></html>")
    base = docs.select(
        base_url.alias("url"),
        F.encode(
            F.concat(head_open, self_canon, robots, tail), "utf-8"
        ).cast("binary").alias("html"),
    )
    back_canon = F.concat(
        F.lit('<link rel="canonical" href="'), base_url, F.lit('">')
    )
    variant = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.concat(base_url, F.lit("?utm_source=feed")).alias("url"),
        F.encode(
            F.concat(head_open, back_canon, robots, tail), "utf-8"
        ).cast("binary").alias("html"),
    )
    return base.unionByName(variant)


_PAGES_SQL = """
  base AS (
    SELECT doc_id, lang,
           'https://' || source || '.example/doc'
             || CAST(doc_id AS VARCHAR) || '.html' AS url
    FROM documents
  ),
  pages AS (
    SELECT url,
           CASE WHEN doc_id % 5 = 0 THEN url ELSE NULL END
             AS canonical_url,
           CAST(doc_id % 7 = 0 AS INT) AS noindex,
           CAST(doc_id % 7 = 0 AS INT) AS nofollow,
           lang AS html_lang
    FROM base
    UNION ALL
    SELECT url || '?utm_source=feed' AS url,
           url AS canonical_url,
           CAST(doc_id % 7 = 0 AS INT) AS noindex,
           CAST(doc_id % 7 = 0 AS INT) AS nofollow,
           lang AS html_lang
    FROM base WHERE doc_id % 3 = 0
  )
"""


@register(
    "head_metadata_parse",
    oracle=f"""
    WITH {_PAGES_SQL}
    SELECT url, coalesce(canonical_url, '') AS canonical_url,
           noindex, nofollow, html_lang
    FROM pages
    """,
)
def head_metadata_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse real constructed HTML heads with the kernel; the oracle
    re-derives every field from the construction rule — any parsing
    error (tag scan, attribute quoting, relative-href resolution,
    robots tokenization) diverges the value hash. Absent canonical is
    '' not NULL (oracle outputs carry no NULLs, the repo's hashing
    convention)."""
    return head_metadata_table(_variant_pages(spark, sf_dir)).select(
        "url",
        F.coalesce(F.col("canonical_url"), F.lit("")).alias(
            "canonical_url"
        ),
        "noindex",
        "nofollow",
        "html_lang",
    )


@register(
    "canonical_collapse_plan",
    oracle=f"""
    WITH {_PAGES_SQL}
    SELECT coalesce(canonical_url, url) AS canonical_target,
           count(*) AS n_variants,
           min(url) AS kept_url
    FROM pages WHERE noindex = 0
    GROUP BY 1
    """,
)
def canonical_collapse_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse the parsed variants onto their canonical targets —
    tracking-parameter twins merge (n_variants = 2, base url kept),
    noindex docs drop, singletons pass through."""
    meta = head_metadata_table(_variant_pages(spark, sf_dir))
    return canonical_collapse(meta).select(
        "canonical_target", "n_variants", "kept_url"
    )


# ---------------------------------------------------------------------------
# soft-404 detection
# ---------------------------------------------------------------------------

# phrase lists from the soft-404 literature (Bar-Yossef et al., "Sic
# Transit Gloria Telae", WWW'04: error pages served with HTTP 200)
SOFT404_TITLE_RE = r"(404|not found|page cannot be found|error)"
SOFT404_BODY_RE = (
    r"(page not found|does not exist|no longer available"
    r"|cannot be found|has been removed)"
)


def soft404_flags(
    df, *, html_col: str = "html", id_col: str = "doc_id"
):
    """(id, title_hit, body_hit, is_soft404): error pages served with
    status 200 — the crawl-QC gate that keeps 'Page Not Found'
    boilerplate out of the training corpus even though the HTTP layer
    said OK. Title from a bounded head scan; body phrases over the
    lowered page. Pure Catalyst (staged projections, each regexp
    once); a pushed-down filter at scale."""
    title = F.lower(
        F.regexp_extract(
            F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1
        )
    )
    return (
        df.withColumn("_t", title)
        .withColumn("title_hit", F.col("_t").rlike(SOFT404_TITLE_RE))
        .withColumn(
            "body_hit",
            F.lower(F.col(html_col)).rlike(SOFT404_BODY_RE),
        )
        .withColumn(
            "is_soft404", F.col("title_hit") | F.col("body_hit")
        )
        .select(id_col, "title_hit", "body_hit", "is_soft404")
    )


@register(
    "soft404_detect",
    oracle="""
    SELECT doc_id,
           doc_id % 6 = 0 AS title_hit,
           doc_id % 6 IN (0, 1) AS body_hit,
           doc_id % 6 IN (0, 1) AS is_soft404
    FROM documents
    """,
)
def soft404_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constructed corpus: %6==0 pages carry a '404 - Page Not Found'
    title AND a 'does not exist' body; %6==1 pages look normal but say
    'no longer available' in the body (the sneaky soft-404); the rest
    are clean. The oracle restates all three flags from the rule."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 6
    # digit-free normal titles: doc_id 404's "Article 404" would
    # (correctly!) trip the title pattern and diverge from the rule
    title = (
        F.when(m == 0, F.lit("404 - Page Not Found"))
        .otherwise(
            F.concat(
                F.lit("Article "),
                F.translate(d, "0123456789", "abcdefghij"),
            )
        )
    )
    body = (
        F.when(m == 0, F.lit("The page you requested does not exist."))
        .when(
            m == 1,
            F.lit("Sorry, this content is no longer available here."),
        )
        .otherwise(F.concat(F.lit("Regular readable content for "), d))
    )
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title></head><body><p>"), body,
        F.lit("</p></body></html>"),
    )
    pages = docs.select("doc_id", html.alias("html"))
    return soft404_flags(pages)
