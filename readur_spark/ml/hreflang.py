"""hreflang alternate-language clusters — translated-variant grouping.

Sites publish translations as variant pages tied together with
`<link rel="alternate" hreflang="xx" href="..">` head tags (Google's
multilingual-site annotation, adopted web-wide). A curation pipeline
wants these clusters explicit for two reasons: translated variants
must NOT be near-dup-killed as redundant (they are distinct training
text), and the clusters themselves are mined as document-aligned
parallel corpora (the web-mined-bitext recipe: CCAligned, El-Kishky
et al. EMNLP'20, aligns documents exactly this way before sentence
alignment).

Extraction is pure Catalyst — explode the `<link ...>` tags, keep the
rel=alternate ones, pull hreflang/href independently so attribute
ORDER never matters (the same any-order stance as ml/license.py).
Cluster identity needs no component iteration: the annotation's
contract is that every variant lists the full alternate set
(including itself), so min(alternate url) is the same value on every
member — one groupBy, no fixed point (ml/components.py remains the
fallback for broken partial meshes).

Scale design (10^12 pages):
  - tag explosion multiplies by head-link count (bounded small), and
    only slim (url, hreflang, alt_url) rows ever shuffle;
  - cluster id = min(href) per page is one combinable aggregate; the
    census is a second; the url-keyed join between them reuses the
    same key;
  - clusters are tiny groups (a few langs), so no skew pressure.

Reference tie-in: the reference stores one language per document
(ocr_lang column, src/models/document.rs) and its dedup tier would
happily collapse translations by visual/structural similarity; this
operator is the guard its multilingual successor needs.

Relation to ml/structured.py: its `hreflang_alternates` pins the
zip-parse kernel and `hreflang_cluster_rollup` groups by a shared
alternate DIRECTORY (all variants under one path — the single-host
layout). THIS module is the general case that layout cannot express:
variants on DIFFERENT hosts (example.de / example.fr), any attribute
order, min-url cluster identity, and the declared-vs-crawled
asymmetry a truncated crawl produces.

Construction rule for the driver queries (SQL-replayable): documents
form translation groups g = doc_id div 3 with variant v = doc_id % 3
→ language (de, en, fr); each page's url embeds its OWN source host
('src' || doc_id % 20 — the datagen rule), language, and g; every
page lists all three siblings (sibling k lives on host
'src' || (3g+k) % 20) plus an x-default pointing at the en variant;
v picks the attribute order (v=1 href-first, v=2 with a type
attribute wedged in) so order-independence is part of the checked
contract. The last group at any scale factor is truncated (fewer
than 3 crawled variants), pinning the declared-vs-crawled asymmetry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

_LINK_TAG_RE = "<link\\b[^>]*>"
_HREFLANG_RE = 'hreflang="([^"]*)"'
_HREF_RE = 'href="([^"]*)"'


def hreflang_edges(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html_str"
) -> DataFrame:
    """(url, hreflang, alt_url) rows from rel=alternate link tags,
    attribute order free. One projection + explode, zero Python."""
    tags = pages.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(_LINK_TAG_RE), 0)
        ).alias("tag"),
    ).filter(
        F.col("tag").contains('rel="alternate"')
        & F.col("tag").contains("hreflang")
    )
    return tags.select(
        "url",
        F.regexp_extract("tag", _HREFLANG_RE, 1).alias("hreflang"),
        F.regexp_extract("tag", _HREF_RE, 1).alias("alt_url"),
    ).filter((F.col("hreflang") != "") & (F.col("alt_url") != ""))


def hreflang_cluster_census(edges: DataFrame) -> DataFrame:
    """(cluster_id, n_pages, n_langs, langs) census; x-default edges
    carry no language and are excluded. cluster_id = min(alt_url)
    over the member's declared set — identical on every member under
    the full-mesh contract."""
    nond = edges.filter(F.col("hreflang") != "x-default")
    clusters = nond.groupBy("url").agg(
        F.min("alt_url").alias("cluster_id")
    )
    return (
        nond.join(clusters, "url")
        .groupBy("cluster_id")
        .agg(
            F.countDistinct("url").cast("long").alias("n_pages"),
            F.countDistinct("hreflang").cast("long").alias("n_langs"),
            F.array_join(
                F.sort_array(F.collect_set("hreflang")), ","
            ).alias("langs"),
        )
    )


# ---- constructed-corpus driver queries -------------------------------------

_LANGS = ["de", "en", "fr"]


def _lang_of(v: Column) -> Column:
    return (
        F.when(v == 0, _LANGS[0]).when(v == 1, _LANGS[1]).otherwise(_LANGS[2])
    )


def constructed_hreflang_pages(df: DataFrame) -> DataFrame:
    """(url, html_str) under the module docstring's rule."""
    g = F.expr("doc_id div 3")
    v = F.col("doc_id") % 3

    def sib_url(k: int) -> Column:
        return F.concat(
            F.lit("https://src"),
            (g * 3 + k) % 20,
            F.lit(".example/"),
            F.lit(_LANGS[k]),
            F.lit("/art/"),
            g,
        )

    def tag(k: int) -> Column:
        lang, u = F.lit(_LANGS[k]), sib_url(k)
        rel_first = F.concat(
            F.lit('<link rel="alternate" hreflang="'), lang,
            F.lit('" href="'), u, F.lit('"/>'),
        )
        href_first = F.concat(
            F.lit('<link href="'), u, F.lit('" hreflang="'), lang,
            F.lit('" rel="alternate"/>'),
        )
        typed = F.concat(
            F.lit('<link rel="alternate" type="text/html" hreflang="'),
            lang, F.lit('" href="'), u, F.lit('"/>'),
        )
        return F.when(v == 1, href_first).when(v == 2, typed).otherwise(
            rel_first
        )

    xdef = F.concat(
        F.lit('<link rel="alternate" hreflang="x-default" href="'),
        sib_url(1),
        F.lit('"/>'),
    )
    html = F.concat(
        F.lit("<html><head><title>t</title>"),
        tag(0), tag(1), tag(2), xdef,
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    own_url = F.concat(
        F.lit("https://src"), F.col("doc_id") % 20, F.lit(".example/"),
        _lang_of(v), F.lit("/art/"), g,
    )
    return df.select(own_url.alias("url"), html.alias("html_str"))


_CONSTRUCT_SQL = """
  SELECT 'https://src' || (doc_id % 20) || '.example/'
           || CASE doc_id % 3 WHEN 0 THEN 'de' WHEN 1 THEN 'en'
              ELSE 'fr' END || '/art/' || (doc_id // 3) AS url,
         '<html><head><title>t</title>'
         || CASE WHEN doc_id % 3 = 1 THEN
              '<link href="' || u0 || '" hreflang="de" rel="alternate"/>'
              || '<link href="' || u1 || '" hreflang="en" rel="alternate"/>'
              || '<link href="' || u2 || '" hreflang="fr" rel="alternate"/>'
            WHEN doc_id % 3 = 2 THEN
              '<link rel="alternate" type="text/html" hreflang="de" href="'
                || u0 || '"/>'
              || '<link rel="alternate" type="text/html" hreflang="en" href="'
                || u1 || '"/>'
              || '<link rel="alternate" type="text/html" hreflang="fr" href="'
                || u2 || '"/>'
            ELSE
              '<link rel="alternate" hreflang="de" href="' || u0 || '"/>'
              || '<link rel="alternate" hreflang="en" href="' || u1 || '"/>'
              || '<link rel="alternate" hreflang="fr" href="' || u2 || '"/>'
            END
         || '<link rel="alternate" hreflang="x-default" href="' || u1
         || '"/>' || '</head><body><p>' || text || '</p></body></html>'
           AS html_str
  FROM (
    SELECT doc_id, text,
      'https://src' || ((doc_id // 3) * 3 + 0) % 20
        || '.example/de/art/' || (doc_id // 3) AS u0,
      'https://src' || ((doc_id // 3) * 3 + 1) % 20
        || '.example/en/art/' || (doc_id // 3) AS u1,
      'https://src' || ((doc_id // 3) * 3 + 2) % 20
        || '.example/fr/art/' || (doc_id // 3) AS u2
    FROM documents
  )
"""

_EDGES_SQL = f"""
    c AS ({_CONSTRUCT_SQL}),
    tags AS (
      SELECT url, t.tag
      FROM c, UNNEST(regexp_extract_all(html_str,
          '{_LINK_TAG_RE}', 0)) AS t(tag)
      WHERE contains(t.tag, 'rel="alternate"')
        AND contains(t.tag, 'hreflang')
    ),
    edges AS (
      SELECT url,
             regexp_extract(tag, '{_HREFLANG_RE}', 1) AS hreflang,
             regexp_extract(tag, '{_HREF_RE}', 1) AS alt_url
      FROM tags
      WHERE regexp_extract(tag, '{_HREFLANG_RE}', 1) <> ''
        AND regexp_extract(tag, '{_HREF_RE}', 1) <> ''
    )
"""


@register(
    "hreflang_edges_parse",
    oracle=f"WITH {_EDGES_SQL} SELECT url, hreflang, alt_url FROM edges",
)
def hreflang_edges_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All alternate-language edges (x-default included) over the
    constructed corpus — every url/lang/href value-hashed across all
    three attribute-order shapes."""
    pages = constructed_hreflang_pages(load(spark, sf_dir, "documents"))
    return hreflang_edges(pages)


@register(
    "hreflang_cluster_census",
    oracle=f"""
    WITH {_EDGES_SQL},
    nond AS (SELECT * FROM edges WHERE hreflang <> 'x-default'),
    clusters AS (
      SELECT url, min(alt_url) AS cluster_id FROM nond GROUP BY url
    )
    SELECT cluster_id,
           CAST(count(DISTINCT n.url) AS BIGINT) AS n_pages,
           CAST(count(DISTINCT hreflang) AS BIGINT) AS n_langs,
           array_to_string(list_sort(list(DISTINCT hreflang)), ',')
             AS langs
    FROM nond n JOIN clusters cl ON n.url = cl.url
    GROUP BY cluster_id
    """,
)
def hreflang_cluster_census_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Translation-cluster census — min-href cluster identity, crawled
    page counts vs declared language counts (the truncated last group
    pins the asymmetry), sorted language lists, all value-hashed."""
    pages = constructed_hreflang_pages(load(spark, sf_dir, "documents"))
    return hreflang_cluster_census(hreflang_edges(pages))
