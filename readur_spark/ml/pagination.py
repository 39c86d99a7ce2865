"""Multi-page article stitching via rel=next/prev pagination chains.

News sites and forums split one logical document across /page/1..N
URLs tied together with `<link rel="next">` / `<link rel="prev">`
head annotations (the HTML spec's sequential-link types, long used by
search engines for pagination discovery). A training corpus that
keeps the parts as separate documents learns truncated context and
systematically double-counts boilerplate; the curation-side fix is to
STITCH each chain back into one document before packing.

The chain walk reuses ml/redirects.py's pointer-doubling kernel on
the PREV direction: each page has at most one predecessor, so the
prev mapping is a functional graph and "find my chain head + my
position" is exactly redirect resolution (head = terminal, position
= hop count) — depth-d chains cost ceil(log2 d) shuffles, and the
additive hop counts give the part order for free. Link parsing is
the same pure-Catalyst any-attribute-order pull as ml/hreflang.py.

Scale design (10^12 pages):
  - only slim (url, prev_url) edges enter the doubling loop; the
    page TEXT joins back exactly once, after positions are known;
  - the stitch itself is one groupBy(head) with an in-group
    array_sort over (position, text) structs — group size is the
    chain length (bounded small by policy), so no skew;
  - circular pagination (malformed) surfaces as the doubling loop's
    unresolved bucket and stitches nothing — flagged, not fatal.

Reference tie-in: the reference re-assembles multi-page PDFs from
per-page OCR results inside one file (src/ocr/enhanced.rs page loop);
this is the cross-URL twin of that reassembly for web corpora.

Relation to ml/structured.py: its `pagination_chain_assembly` stops
at POSITION ASSIGNMENT ((url, chain_head, page_seq) on fixed-length
chains). THIS module finishes the job the curation pipeline needs:
the stitched document text itself, variable chain lengths, standalone
passthrough, and the circular-chain keep-text policy.

Construction rule for the driver query (SQL-replayable): documents
form article blocks g = doc_id div 5 with part p = doc_id % 5; the
block's declared part count is n = g % 4 + 1, pages with p < n chain
via next/prev links (all parts share the block host 'src' || g % 20),
pages with p >= n are standalone. The oracle RESTATES the stitched
text per block straight from the rule (string_agg over parts ordered
by p) — fully independent of the parse + pointer-doubling path it
checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.redirects import resolve_redirects
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

_LINK_TAG_RE = "<link\\b[^>]*>"
_HREF_RE = 'href="([^"]*)"'
ROUNDS = 3  # stitches chains up to 2^3 = 8 parts


def rel_link(pages: DataFrame, rel: str, *, url_col: str = "url",
             html_col: str = "html_str") -> DataFrame:
    """(url, href) rows for one rel type (next/prev), attribute order
    free; at most one edge per page is the caller's contract (the
    functional-graph requirement) — enforced by min() for safety."""
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_LINK_TAG_RE), 0)
        ).alias("tag"),
    ).filter(F.col("tag").contains(f'rel="{rel}"'))
    return (
        tags.select(
            "url", F.regexp_extract("tag", _HREF_RE, 1).alias("href")
        )
        .filter(F.col("href") != "")
        .groupBy("url")
        .agg(F.min("href").alias("href"))
    )


def stitch_paginated(
    pages: DataFrame,
    *,
    url_col: str = "url",
    html_col: str = "html_str",
    text_col: str = "text",
    rounds: int = ROUNDS,
) -> DataFrame:
    """(head_url, n_parts, stitched_text) — one row per logical
    document. Standalone pages pass through with n_parts = 1; pages
    on circular prev chains stitch as themselves (policy: never lose
    text) with is_loop = true."""
    prev_edges = rel_link(pages, "prev", url_col=url_col,
                          html_col=html_col).select(
        F.col("url").alias("src_url"), F.col("href").alias("dst_url")
    )
    res = resolve_redirects(prev_edges, rounds=rounds).select(
        F.col("src_url").alias(url_col),
        F.col("final_url").alias("_head"),
        F.col("hops").alias("_pos"),
        F.col("resolved").alias("_resolved"),
    )
    placed = pages.join(res, url_col, "left").select(
        F.when(
            F.col("_resolved").isNull() | ~F.col("_resolved"),
            F.col(url_col),
        )
        .otherwise(F.col("_head"))
        .alias("head_url"),
        F.coalesce(
            F.when(F.col("_resolved"), F.col("_pos")), F.lit(0)
        ).alias("pos"),
        F.col(text_col).alias("text"),
        F.coalesce(~F.col("_resolved"), F.lit(False)).alias("is_loop"),
    )
    return placed.groupBy("head_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "text"))),
                lambda x: x.getField("text"),
            ),
            " ",
        ).alias("stitched_text"),
        F.max("is_loop").alias("is_loop"),
    )


# ---- constructed-corpus driver query --------------------------------------


def constructed_paginated_pages(df: DataFrame) -> DataFrame:
    """(url, html_str, text) under the module docstring's rule."""
    g = F.expr("doc_id div 5")
    p = F.col("doc_id") % 5
    n = g % 4 + 1

    def page_url(part: Column) -> Column:
        return F.concat(
            F.lit("https://src"), g % 20, F.lit(".example/art/"), g,
            F.lit("/page/"), part,
        )

    next_tag = F.when(
        p + 1 < n,
        F.concat(F.lit('<link rel="next" href="'), page_url(p + 1),
                 F.lit('"/>')),
    ).otherwise(F.lit(""))
    prev_tag = F.when(
        (p > 0) & (p < n),
        F.concat(F.lit('<link href="'), page_url(p - 1),
                 F.lit('" rel="prev"/>')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>t</title>"), next_tag, prev_tag,
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return df.select(
        page_url(p).alias("url"), html.alias("html_str"), "text"
    )


@register(
    "pagination_stitch",
    oracle="""
    WITH d AS (
      SELECT doc_id, text,
             doc_id // 5 AS g, doc_id % 5 AS p,
             (doc_id // 5) % 4 + 1 AS n
      FROM documents
    ),
    stitched AS (
      SELECT 'https://src' || (g % 20) || '.example/art/' || g
               || '/page/0' AS head_url,
             CAST(count(*) AS BIGINT) AS n_parts,
             string_agg(text, ' ' ORDER BY p) AS stitched_text,
             false AS is_loop
      FROM d WHERE p < n GROUP BY g
    ),
    standalone AS (
      SELECT 'https://src' || (g % 20) || '.example/art/' || g
               || '/page/' || p AS head_url,
             CAST(1 AS BIGINT) AS n_parts,
             text AS stitched_text,
             false AS is_loop
      FROM d WHERE p >= n
    )
    SELECT * FROM stitched UNION ALL SELECT * FROM standalone
    """,
)
def pagination_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stitch the constructed pagination corpus — the oracle restates
    every stitched text straight from the construction rule, fully
    independent of the link parse + pointer doubling under test; part
    order, part counts, and standalone passthrough all value-hashed."""
    pages = constructed_paginated_pages(load(spark, sf_dir, "documents"))
    return stitch_paginated(pages)
