"""Image–text pair mining from page markup (the LAION recipe's
web-side half).

Image-text datasets (LAION-400M/5B, DataComp) are built by walking
Common-Crawl HTML for ``<img>`` tags, pairing each image URL with its
``alt`` text (plus any ``<figcaption>``), and keeping pairs whose alt
is long enough and not a generic placeholder — only THEN does the
expensive CLIP-side filtering run. This module is that web-side half:

  1. ``extract_image_alts`` — every ``<img>`` tag in document order,
     attribute-order free (src/alt pulled independently, the same
     any-order convention as ml/hreflang.py's link parse);
  2. ``figure_captions`` — ``<figure><img…><figcaption>`` captions
     bound to their image src;
  3. ``alt_pair_gate`` — the LAION-style pre-filter: alt length ≥ 5
     chars and not in the generic-placeholder stoplist.

Scale design (10^12 pages): the tag pulls are one
``regexp_extract_all`` projection per page — the payload crosses no
shuffle and never enters Python; what shuffles is the slim
(url, src, alt) pair frame, whose size is the corpus's image-tag
count, not its byte count. The caption join runs pairs-side only and
broadcasts at any realistic captions/pairs ratio. Downstream, the
(src, alt) pairs are exactly what feeds the binary-column multimodal
tier (ml/multimodal.py fetch/decode stubs).

Reference tie-in: the reference extracts per-image OCR text and
stores it alongside the image row (src/ocr/enhanced.rs image branch);
this is the markup-declared twin of that image→text binding.

Construction rule (SQL-restatable, over ``documents``): pages with
doc_id % 2 == 0 carry k = doc_id % 3 + 1 images; image j has
src 'https://img.example/<doc_id>_<j>.jpg'; alt is the placeholder
'logo' when j == 0 and doc_id % 5 == 0, else
'picture of <source> <doc_id>_<j>'; odd j writes alt before src (the
attribute-order probe); image 0 is wrapped in
<figure>…<figcaption>caption for <doc_id></figcaption></figure> when
doc_id % 6 == 0.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load, synthetic_url

_IMG_TAG_RE = "<img\\b[^>]*>"
_SRC_RE = 'src="([^"]*)"'
_ALT_RE = 'alt="([^"]*)"'
_FIGURE_RE = "<figure>(<img\\b[^>]*>)<figcaption>([^<]*)</figcaption></figure>"

# Generic placeholders LAION-style filtering drops regardless of length.
ALT_STOPLIST = ["logo", "image", "photo", "icon"]
MIN_ALT_CHARS = 5


def extract_image_alts(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, img_idx, src, alt, n_alt_chars) — every img tag in
    document order; src/alt pulled independently so attribute order
    never matters. Missing attributes surface as '' (kept visible for
    the gate, which drops them on length)."""
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_IMG_TAG_RE), 0)
        ).alias("img_idx", "tag"),
    )
    return tags.select(
        "url",
        F.col("img_idx").cast("long").alias("img_idx"),
        F.regexp_extract("tag", _SRC_RE, 1).alias("src"),
        F.regexp_extract("tag", _ALT_RE, 1).alias("alt"),
        F.length(F.regexp_extract("tag", _ALT_RE, 1))
        .cast("long")
        .alias("n_alt_chars"),
    )


def figure_captions(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, src, caption) for every figure-wrapped image."""
    figs = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_FIGURE_RE), 0)
        ).alias("fig"),
    )
    img_tag = F.regexp_extract("fig", _FIGURE_RE, 1)
    return figs.select(
        "url",
        F.regexp_extract(img_tag, _SRC_RE, 1).alias("src"),
        F.regexp_extract("fig", _FIGURE_RE, 2).alias("caption"),
    )


def alt_pair_gate(alt: Column, n_alt_chars: Column) -> Column:
    """LAION-style pre-filter: long enough and not a placeholder."""
    return (n_alt_chars >= MIN_ALT_CHARS) & ~alt.isin(ALT_STOPLIST)


def image_text_pairs(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, img_idx, src, alt, caption, keep) — the mined pair table.
    Captions join the slim pair frame by (url, src); the gate is a
    projection."""
    pairs = extract_image_alts(pages, url_col=url_col, html_col=html_col)
    caps = figure_captions(pages, url_col=url_col, html_col=html_col)
    return pairs.join(F.broadcast(caps), ["url", "src"], "left").select(
        "url", "img_idx", "src", "alt",
        # empty-string sentinel for caption-less images (the registry
        # compare is NULL-averse; same convention as unresolved
        # redirects in ml/redirects.py)
        F.coalesce(F.col("caption"), F.lit("")).alias("caption"),
        alt_pair_gate(F.col("alt"), F.col("n_alt_chars")).alias("keep"),
    )


# ---- constructed corpus (module-docstring rule) ------------------------------


def constructed_image_pages(docs: DataFrame) -> DataFrame:
    """(url, html_str) under the construction rule."""
    def src(j: int) -> Column:
        return F.concat(
            F.lit("https://img.example/"), F.col("doc_id"),
            F.lit(f"_{j}.jpg"),
        )

    def alt(j: int) -> Column:
        placeholder = (F.lit(j == 0)) & (F.col("doc_id") % 5 == 0)
        return F.when(placeholder, F.lit("logo")).otherwise(
            F.concat(
                F.lit("picture of "), F.col("source"), F.lit(" "),
                F.col("doc_id"), F.lit(f"_{j}"),
            )
        )

    def img(j: int) -> Column:
        if j % 2 == 1:  # attribute-order probe: alt first on odd j
            return F.concat(
                F.lit('<img alt="'), alt(j), F.lit('" src="'), src(j),
                F.lit('">'),
            )
        return F.concat(
            F.lit('<img src="'), src(j), F.lit('" alt="'), alt(j),
            F.lit('">'),
        )

    fig0 = F.concat(
        F.lit("<figure>"), img(0), F.lit("<figcaption>caption for "),
        F.col("doc_id"), F.lit("</figcaption></figure>"),
    )
    b0 = F.when(F.col("doc_id") % 6 == 0, fig0).otherwise(img(0))
    k = F.col("doc_id") % 3 + 1
    blocks = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            b0,
            F.when(k >= 2, img(1)).otherwise(F.lit("")),
            F.when(k >= 3, img(2)).otherwise(F.lit("")),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body>"), blocks, F.lit("<p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(synthetic_url().alias("url"), html.alias("html_str"))


@register(
    "image_alt_pairs",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id, source, j AS img_idx,
             'https://img.example/' || doc_id || '_' || j || '.jpg'
               AS src,
             CASE WHEN j = 0 AND doc_id % 5 = 0 THEN 'logo'
                  ELSE 'picture of ' || source || ' ' || doc_id
                       || '_' || j END AS alt,
             CASE WHEN j = 0 AND doc_id % 6 = 0
                  THEN 'caption for ' || doc_id ELSE '' END AS caption
      FROM documents, unnest(range(doc_id % 3 + 1)) AS t(j)
      WHERE doc_id % 2 = 0
    )
    SELECT 'https://' || source || '.example/doc' || doc_id || '.txt'
             AS url,
           CAST(img_idx AS BIGINT) AS img_idx,
           src, alt, caption,
           length(alt) >= {MIN_ALT_CHARS}
             AND alt NOT IN ({", ".join("'" + s + "'" for s in ALT_STOPLIST)})
             AS keep
    FROM imgs
    """,
)
def image_alt_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine image-text pairs from the constructed corpus — the oracle
    restates every (src, alt, caption, keep) row straight from the
    rule, independent of the tag parse, attribute-order handling, and
    caption join under test."""
    pages = constructed_image_pages(load(spark, sf_dir, "documents"))
    return image_text_pairs(pages)


# ---- composed chain: mined pairs -> deduped image fetch plan ----------------

# Construction rule (SQL-restatable): pages doc_id % 2 == 0 carry ONE
# image of group g = doc_id div 4 — src
# 'https://img<g % 7>.example/i<g>.jpg' (seven image hosts), alt 'logo'
# (placeholder, dropped by the gate) when g % 5 == 0 else
# 'picture of item <g>' — so every surviving image is referenced by
# exactly two pages and must be fetched ONCE.

FETCH_DELAY_BASE_MS = 400
FETCH_DELAY_STEP_MS = 200
FETCH_DELAY_MOD = 5


def constructed_multihost_image_pages(docs: DataFrame) -> DataFrame:
    """(url, html_str) under the fetch-plan construction rule."""
    g = F.expr("doc_id div 4")
    src = F.concat(
        F.lit("https://img"), g % 7, F.lit(".example/i"), g, F.lit(".jpg")
    )
    alt = F.when(g % 5 == 0, F.lit("logo")).otherwise(
        F.concat(F.lit("picture of item "), g)
    )
    img = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit('<img src="'), src, F.lit('" alt="'), alt,
                 F.lit('">')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><body>"), img, F.lit("<p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(synthetic_url().alias("url"), html.alias("html_str"))


@register(
    "image_fetch_plan",
    oracle=f"""
    WITH refs AS (
      SELECT doc_id // 4 AS g, count(*) AS n_refs
      FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    imgs AS (
      SELECT 'https://img' || (g % 7) || '.example/i' || g || '.jpg'
               AS src,
             'img' || (g % 7) || '.example' AS host,
             CAST(n_refs AS BIGINT) AS n_refs
      FROM refs WHERE g % 5 <> 0
    ),
    d AS (
      SELECT imgs.*,
             {FETCH_DELAY_BASE_MS}
               + (CAST(concat('0x', substr(md5(host), 1, 8)) AS BIGINT)
                  % {FETCH_DELAY_MOD}) * {FETCH_DELAY_STEP_MS} AS delay_ms
      FROM imgs
    ),
    r AS (
      SELECT src, host, n_refs, delay_ms,
             CAST(row_number() OVER (PARTITION BY host ORDER BY md5(src))
                  - 1 AS BIGINT) AS wave
      FROM d
    )
    SELECT src, host, n_refs, wave,
           CAST(wave * delay_ms AS BIGINT) AS offset_ms
    FROM r
    """,
)
def image_fetch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed chain: image-text pair mining → per-src dedup (the
    same image referenced from many pages downloads once, with its
    reference count kept for prioritization) → host extraction → the
    crawl tier's politeness schedule (queries/crawl.py
    politeness_schedule — per-host fetch waves at host-specific
    delays). The oracle restates the surviving srcs, reference
    counts, hosts, delays, and every wave straight from the
    construction rule.

    Scale: the pair frame is already slim; dedup is one hash agg on
    src; the politeness window is per-host — the image-side twin of
    the page frontier's plan, sized by distinct images, not pages."""
    from readur_spark.queries.crawl import politeness_schedule

    pages = constructed_multihost_image_pages(
        load(spark, sf_dir, "documents")
    )
    pairs = image_text_pairs(pages).filter(F.col("keep"))
    imgs = pairs.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_refs")
    )
    hosted = imgs.select(
        "src", "n_refs",
        F.regexp_extract("src", "https://([^/]+)/", 1).alias("host"),
    )
    delayed = hosted.withColumn(
        "delay_ms",
        F.lit(FETCH_DELAY_BASE_MS)
        + (
            F.conv(F.substring(F.md5(F.encode(F.col("host"), "UTF-8")), 1, 8),
                   16, 10).cast("long")
            % FETCH_DELAY_MOD
        )
        * FETCH_DELAY_STEP_MS,
    )
    return politeness_schedule(
        delayed, id_col="src", host_col="host", key_col="src",
        delay_col="delay_ms",
    ).join(hosted.select("src", "n_refs"), "src").select(
        "src", "host", "n_refs", "wave", "offset_ms"
    )


# ---- responsive / lazy-loaded images (srcset + data-src) --------------------

# Real Common-Crawl markup rarely carries a plain src: responsive
# images declare a srcset of width-annotated candidates and
# lazy-loading themes park the URL in data-src behind a 1px
# placeholder. A miner that reads only src collects placeholder GIFs.

_SRCSET_RE = 'srcset="([^"]*)"'
_DATA_SRC_RE = 'data-src="([^"]*)"'


def best_srcset_candidate(srcset: Column) -> Column:
    """Highest-width candidate URL from a srcset value
    ('url1 640w, url2 1280w, …'): parse each comma entry into
    (url, width), take max by (width, url). Width-less entries (e.g.
    '2x' density descriptors or bare urls) count as width 0 — any
    explicit width beats them, matching browser fallback order.
    Pure Catalyst: transform + array_max over a struct array."""
    entries = F.transform(
        F.split(srcset, ","),
        lambda e: F.struct(
            F.coalesce(
                # try_cast: width-less entries ('2x' densities, bare
                # urls) extract '' which ANSI cast would throw on
                F.regexp_extract(F.trim(e), "\\s(\\d+)w$", 1)
                .try_cast("long"),
                F.lit(0),
            ).alias("width"),
            F.regexp_extract(F.trim(e), "^(\\S+)", 1).alias("url"),
        ),
    )
    best = F.array_max(entries)
    return F.when(F.trim(srcset) != "", best.getField("url"))


def extract_image_sources(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, img_idx, src, effective_src, src_kind) — effective_src
    resolves the fetch-worthy URL per the browser's own precedence:
    largest srcset candidate > data-src (lazy themes) > src."""
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_IMG_TAG_RE), 0)
        ).alias("img_idx", "tag"),
    )
    src = F.regexp_extract("tag", _SRC_RE, 1)
    data_src = F.regexp_extract("tag", _DATA_SRC_RE, 1)
    srcset = F.regexp_extract("tag", _SRCSET_RE, 1)
    best = best_srcset_candidate(srcset)
    eff = F.coalesce(
        best,
        F.when(data_src != "", data_src),
        F.when(src != "", src),
        F.lit(""),
    )
    kind = (
        F.when(best.isNotNull(), F.lit("srcset"))
        .when(data_src != "", F.lit("data-src"))
        .when(src != "", F.lit("src"))
        .otherwise(F.lit("none"))
    )
    return tags.select(
        "url",
        F.col("img_idx").cast("long").alias("img_idx"),
        src.alias("src"),
        eff.alias("effective_src"),
        kind.alias("src_kind"),
    )


def constructed_responsive_pages(docs: DataFrame) -> DataFrame:
    """(url, html_str): doc_id % 3 == 0 pages carry a srcset image
    (k = doc_id % 2 + 2 width-annotated candidates, widths (j+1)*320,
    declared SMALLEST-FIRST so max-selection is exercised, plus a
    placeholder src); doc_id % 3 == 1 pages carry a lazy image
    (data-src real, src placeholder); doc_id % 3 == 2 pages carry a
    plain src image."""
    g = F.col("doc_id")

    def cand(j: int) -> Column:
        return F.concat(
            F.lit("https://cdn.example/i"), g, F.lit(f"_{(j + 1) * 320}.jpg "),
            F.lit(f"{(j + 1) * 320}w"),
        )

    k = g % 2 + 2  # 2 or 3 candidates
    srcset_val = F.concat(
        cand(0), F.lit(", "), cand(1),
        F.when(k == 3, F.concat(F.lit(", "), cand(2))).otherwise(F.lit("")),
    )
    img = (
        F.when(
            g % 3 == 0,
            F.concat(
                F.lit('<img src="placeholder.gif" srcset="'), srcset_val,
                F.lit('">'),
            ),
        )
        .when(
            g % 3 == 1,
            F.concat(
                F.lit('<img src="1px.gif" data-src="https://cdn.example/lazy'),
                g, F.lit('.jpg">'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<img src="https://cdn.example/plain'), g,
                F.lit('.jpg">'),
            )
        )
    )
    html = F.concat(
        F.lit("<html><body>"), img, F.lit("<p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select(synthetic_url().alias("url"), html.alias("html_str"))


@register(
    "image_srcset_resolve",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, doc_id % 3 AS m, doc_id % 2 + 2 AS k
      FROM documents
    )
    SELECT 'https://' || source || '.example/doc' || doc_id || '.txt'
             AS url,
           CAST(0 AS BIGINT) AS img_idx,
           CASE WHEN m = 0 THEN 'placeholder.gif'
                WHEN m = 1 THEN '1px.gif'
                ELSE 'https://cdn.example/plain' || doc_id || '.jpg'
           END AS src,
           CASE WHEN m = 0 THEN 'https://cdn.example/i' || doc_id || '_'
                                || (k * 320) || '.jpg'
                WHEN m = 1 THEN 'https://cdn.example/lazy' || doc_id
                                || '.jpg'
                ELSE 'https://cdn.example/plain' || doc_id || '.jpg'
           END AS effective_src,
           CASE WHEN m = 0 THEN 'srcset'
                WHEN m = 1 THEN 'data-src'
                ELSE 'src' END AS src_kind
    FROM d
    """,
)
def image_srcset_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolve every constructed image to its fetch-worthy URL — the
    oracle restates the max-width srcset pick (candidates declared
    smallest-first), the data-src fallback, and the plain-src case
    straight from the rule."""
    pages = constructed_responsive_pages(load(spark, sf_dir, "documents"))
    return extract_image_sources(pages)
