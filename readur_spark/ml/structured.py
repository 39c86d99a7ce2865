"""Structured page metadata: JSON-LD, Open Graph, hreflang, feeds, IBAN.

Web pages carry machine-readable metadata alongside their prose, and a
crawl-scale curation pipeline reads it for signals no text heuristic
can recover: schema.org JSON-LD blocks name the page type and
publication date authoritatively, Open Graph / Twitter-card tags carry
the publisher's own title and hero image, `hreflang` alternates group
the language variants of one logical page (the cross-language dedup
signal), RSS/Atom autodiscovery links expose a site's change feed (the
cheap recrawl channel), and IBAN account numbers are a PII class with
a *checksum* — ISO 13616 mod-97 — so detection can be exact instead of
regex-probabilistic. The reference engine ingests files, not pages, so
it has no analogue (nearest: metadata extraction per format,
`src/metadata_extraction.rs`); this module is crawl-tier extension
surface alongside `ml/headmeta.py` (canonical/robots/lang) and
`ml/linkgraph.py` (outlinks/anchors).

Everything here is **pure Catalyst** — `regexp_extract[_all]`,
`get_json_object`, `arrays_zip`/`explode`, and decimal arithmetic, all
JVM-side inside whole-stage codegen. No Python crosses the executor
boundary for any query in this module: the payload is scanned once by
a codegen'd projection and only slim string columns survive. At 100 TB
that means the scan is the cost; there is no UDF serialization, no
Arrow hop, and the only shuffles are the final small aggregates.

Correctness follows the module's constructed-corpus convention
(`ml/linkgraph.py` `outlink_edges_parse`): each registered query
builds REAL page payloads from the driver's `documents` table by a
deterministic construction rule, parses them with the production
expressions, and the DuckDB oracle RE-DERIVES the expected output from
the same rule in pure SQL — the parse and the derivation agree only if
the parser reads every tag correctly. The IBAN oracle goes further:
both engines independently compute the mod-97 checksum (Spark
`decimal(38,0)` remainder, DuckDB `HUGEINT` remainder), so the
validation arithmetic itself is cross-checked, not assumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


# ---------------------------------------------------------------------------
# shared construction helpers
# ---------------------------------------------------------------------------


def _page_url(prefix: str = "p") -> Column:
    return F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/"),
        F.lit(prefix), F.col("doc_id").cast("string"), F.lit(".html"),
    )


def _nonempty(col: Column) -> Column:
    """'' → NULL (regexp_extract signals no-match with '')."""
    return F.when(col != F.lit(""), col)


# ---------------------------------------------------------------------------
# JSON-LD (schema.org) extraction
# ---------------------------------------------------------------------------

_LD_BLOCK = r'(?s)<script type="application/ld\+json">(.*?)</script>'


def jsonld_fields(pages: DataFrame) -> DataFrame:
    """(url, ld_type, headline, date_published) from the first JSON-LD
    script block. `regexp_extract` isolates the block (non-greedy, so
    trailing plain-JS script tags never bleed in), `get_json_object`
    reads the fields — both JVM intrinsics, zero Python. Pages without
    a block yield NULLs (regexp '' no-match → NULL json input)."""
    j = _nonempty(F.regexp_extract(F.col("page"), _LD_BLOCK, 1))

    def field(path: str) -> Column:
        # '' sentinel, not NULL — the repo's hashing convention
        return F.coalesce(F.get_json_object(j, path), F.lit(""))

    return pages.select(
        "url",
        field("$['@type']").alias("ld_type"),
        field("$.headline").alias("headline"),
        field("$.datePublished").alias("date_published"),
    )


def _jsonld_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: every doc except multiples of 7 embeds one
    JSON-LD block — @type NewsArticle when doc_id%4==0 else Article,
    headline 'Doc <id> (<lang>)', datePublished 2024-01-<1+id%28> —
    followed by a decoy plain-JS script tag the non-greedy block regex
    must not swallow."""
    docs = load(spark, sf_dir, "documents")
    day = F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0")
    typ = F.when(F.col("doc_id") % 4 == 0, F.lit("NewsArticle")).otherwise(
        F.lit("Article")
    )
    block = F.concat(
        F.lit('<script type="application/ld+json">{"@type":"'), typ,
        F.lit('","headline":"Doc '), F.col("doc_id").cast("string"),
        F.lit(" ("), F.col("lang"), F.lit(')","datePublished":"2024-01-'),
        day, F.lit('"}</script>'),
    )
    page = F.concat(
        F.lit("<html><head>"),
        F.when(F.col("doc_id") % 7 != 0, block).otherwise(F.lit("")),
        F.lit('<script type="text/javascript">var x = "</div>";</script>'),
        F.lit("</head><body>ok</body></html>"),
    )
    return docs.select(_page_url().alias("url"), page.alias("page"))


@register(
    "jsonld_extract",
    oracle="""
    SELECT 'https://' || source || '.example/p' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
           CASE WHEN doc_id % 7 = 0 THEN ''
                WHEN doc_id % 4 = 0 THEN 'NewsArticle'
                ELSE 'Article' END AS ld_type,
           CASE WHEN doc_id % 7 = 0 THEN ''
                ELSE 'Doc ' || CAST(doc_id AS VARCHAR) || ' (' || lang || ')'
                END AS headline,
           CASE WHEN doc_id % 7 = 0 THEN ''
                ELSE '2024-01-' ||
                     lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                END AS date_published
    FROM documents
    """,
)
def jsonld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD parse value-hash-checked end-to-end: the
    oracle re-derives @type/headline/datePublished from the
    construction rule while Spark actually extracts the block and
    walks the JSON — including the no-block NULL rows and the decoy
    script tag."""
    return jsonld_fields(_jsonld_pages(spark, sf_dir))


# ---------------------------------------------------------------------------
# Open Graph / Twitter cards + feed autodiscovery
# ---------------------------------------------------------------------------


def og_fields(pages: DataFrame) -> DataFrame:
    """(url, og_title, og_image, twitter_card) from meta tags; absent
    tags yield '' (regexp_extract's own no-match sentinel, kept — the
    repo's hashing convention is NULL-free outputs). Property-anchored
    regexes so og:locale or other decoys never match."""
    pat = '<meta property="og:{}" content="([^"]*)"'
    return pages.select(
        "url",
        F.regexp_extract(F.col("page"), pat.format("title"), 1).alias(
            "og_title"
        ),
        F.regexp_extract(F.col("page"), pat.format("image"), 1).alias(
            "og_image"
        ),
        F.regexp_extract(
            F.col("page"),
            '<meta name="twitter:card" content="([^"]*)"',
            1,
        ).alias("twitter_card"),
    )


def feed_links(pages: DataFrame) -> DataFrame:
    """(url, feed_url) for pages advertising an RSS autodiscovery
    link; root-relative hrefs resolve against the page's host (the
    only relative form the construction emits)."""
    href = _nonempty(
        F.regexp_extract(
            F.col("page"),
            '<link rel="alternate" type="application/rss\\+xml"'
            ' href="([^"]*)"',
            1,
        )
    )
    host = F.regexp_extract(F.col("url"), r"https://([^/]+)/", 1)
    resolved = F.when(
        href.startswith("/"),
        F.concat(F.lit("https://"), host, href),
    ).otherwise(href)
    return pages.select("url", resolved.alias("feed_url")).where(
        F.col("feed_url").isNotNull()
    )


def _og_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: og:title always ('Doc <id>'), og:image on
    even docs, twitter:card summary_large_image when doc_id%3==0 else
    summary, an og:locale decoy always, and a root-relative RSS
    autodiscovery link on odd docs."""
    docs = load(spark, sf_dir, "documents")
    img = F.concat(
        F.lit('<meta property="og:image" content="https://img.example/'),
        F.col("doc_id").cast("string"), F.lit('.jpg">'),
    )
    card = F.when(
        F.col("doc_id") % 3 == 0, F.lit("summary_large_image")
    ).otherwise(F.lit("summary"))
    feed = F.lit(
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml">'
    )
    page = F.concat(
        F.lit('<html><head><meta property="og:locale" content="x_X">'),
        F.lit('<meta property="og:title" content="Doc '),
        F.col("doc_id").cast("string"), F.lit('">'),
        F.when(F.col("doc_id") % 2 == 0, img).otherwise(F.lit("")),
        F.lit('<meta name="twitter:card" content="'), card, F.lit('">'),
        F.when(F.col("doc_id") % 2 == 1, feed).otherwise(F.lit("")),
        F.lit("</head></html>"),
    )
    return docs.select(_page_url().alias("url"), page.alias("page"))


@register(
    "og_card_extract",
    oracle="""
    SELECT 'https://' || source || '.example/p' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
           'Doc ' || CAST(doc_id AS VARCHAR) AS og_title,
           CASE WHEN doc_id % 2 = 0
                THEN 'https://img.example/' || CAST(doc_id AS VARCHAR)
                     || '.jpg'
                ELSE '' END AS og_image,
           CASE WHEN doc_id % 3 = 0 THEN 'summary_large_image'
                ELSE 'summary' END AS twitter_card
    FROM documents
    """,
)
def og_card_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open Graph / Twitter-card parse value-hash-checked end-to-end
    (decoy og:locale present on every page; NULL og:image on odd
    docs)."""
    return og_fields(_og_pages(spark, sf_dir))


@register(
    "feed_autodiscovery",
    oracle="""
    SELECT 'https://' || source || '.example/p' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
           'https://' || source || '.example/feed.xml' AS feed_url
    FROM documents
    WHERE doc_id % 2 = 1
    """,
)
def feed_autodiscovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS autodiscovery links extracted and resolved against the page
    host; even docs carry no feed link and must be absent."""
    return feed_links(_og_pages(spark, sf_dir))


# ---------------------------------------------------------------------------
# hreflang language alternates
# ---------------------------------------------------------------------------

_HREFLANG_LANGS = r'<link rel="alternate" hreflang="([^"]*)"'
_HREFLANG_HREFS = r'hreflang="[^"]*" href="([^"]*)"'


def hreflang_table(pages: DataFrame) -> DataFrame:
    """(url, hreflang, alt_url) — one row per alternate link. Two
    parallel `regexp_extract_all` arrays (both anchored on the
    hreflang attribute so stylesheet/canonical links never misalign
    them) zipped and exploded, all codegen."""
    langs = F.regexp_extract_all(F.col("page"), F.lit(_HREFLANG_LANGS), 1)
    hrefs = F.regexp_extract_all(F.col("page"), F.lit(_HREFLANG_HREFS), 1)
    z = F.explode(F.arrays_zip(langs.alias("l"), hrefs.alias("u")))
    return pages.select("url", z.alias("z")).select(
        "url",
        F.col("z.l").alias("hreflang"),
        F.col("z.u").alias("alt_url"),
    )


def _hreflang_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: page of doc d belongs to cluster c = d DIV 3
    and lists four alternates — l0/l1/l2 plus x-default — all under
    https://alt.example/c<c>/, between a stylesheet-link decoy and a
    canonical-link decoy (both carry href and must not pair with any
    hreflang)."""
    docs = load(spark, sf_dir, "documents")
    cluster = F.expr("doc_id DIV 3").cast("string")
    base = F.concat(F.lit("https://alt.example/c"), cluster, F.lit("/"))

    def alt(lang: str, leaf: str) -> Column:
        return F.concat(
            F.lit(f'<link rel="alternate" hreflang="{lang}" href="'),
            base, F.lit(f'{leaf}">'),
        )

    page = F.concat(
        F.lit('<link rel="stylesheet" href="/style.css">'),
        alt("l0", "l0.html"), alt("l1", "l1.html"), alt("l2", "l2.html"),
        alt("x-default", "default.html"),
        F.lit('<link rel="canonical" href="https://alt.example/x">'),
    )
    return docs.select(_page_url().alias("url"), page.alias("page"))


@register(
    "hreflang_alternates",
    oracle="""
    SELECT 'https://' || source || '.example/p' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
           t.hreflang,
           'https://alt.example/c' || CAST(doc_id // 3 AS VARCHAR) || '/'
             || t.leaf AS alt_url
    FROM documents
    CROSS JOIN (VALUES ('l0', 'l0.html'), ('l1', 'l1.html'),
                       ('l2', 'l2.html'), ('x-default', 'default.html'))
           AS t(hreflang, leaf)
    """,
)
def hreflang_alternates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang alternate extraction value-hash-checked end-to-end:
    four alternates per page re-derived by the oracle, with href-
    bearing decoy links that would shift the zip if the regexes were
    not hreflang-anchored."""
    return hreflang_table(_hreflang_pages(spark, sf_dir))


@register(
    "hreflang_cluster_rollup",
    oracle="""
    WITH alts AS (
      SELECT doc_id, 'https://alt.example/c' || CAST(doc_id // 3 AS VARCHAR)
               || '/' AS cluster_key,
             t.hreflang
      FROM documents,
           UNNEST(['l0', 'l1', 'l2', 'x-default']) AS t(hreflang)
    )
    SELECT cluster_key,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages,
           CAST(count(DISTINCT hreflang) AS BIGINT) AS n_langs
    FROM alts
    GROUP BY cluster_key
    """,
)
def hreflang_cluster_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-language page clusters: pages sharing one alternate set
    collapse onto the set's directory key — the grouping a pipeline
    uses to keep ONE language variant per logical page instead of
    near-duplicating across translations. Slim-string group-by on the
    parsed alternates (map-side combinable; the cluster key is the
    shuffle key, cardinality = #logical pages, far below #rows)."""
    alts = hreflang_table(_hreflang_pages(spark, sf_dir))
    key = F.regexp_extract(F.col("alt_url"), r"^(.*/)[^/]*$", 1)
    return (
        alts.select("url", key.alias("cluster_key"), "hreflang")
        .groupBy("cluster_key")
        .agg(
            F.countDistinct("url").alias("n_pages"),
            F.countDistinct("hreflang").alias("n_langs"),
        )
    )


# ---------------------------------------------------------------------------
# RSS feed item parse
# ---------------------------------------------------------------------------


def feed_items(feeds: DataFrame) -> DataFrame:
    """(feed_url, item_title, item_link, pub_date) — `<item>` chunks
    isolated with a non-greedy regexp_extract_all, exploded, then
    per-field regexes on each chunk. The channel-level <title> sits
    outside every chunk, so it can never contaminate item titles."""
    chunks = F.regexp_extract_all(
        F.col("page"), F.lit(r"(?s)<item>(.*?)</item>"), 1
    )
    it = feeds.select("url", F.explode(chunks).alias("chunk"))
    return it.select(
        F.col("url").alias("feed_url"),
        F.regexp_extract("chunk", r"<title>([^<]*)</title>", 1).alias(
            "item_title"
        ),
        F.regexp_extract("chunk", r"<link>([^<]*)</link>", 1).alias(
            "item_link"
        ),
        F.regexp_extract("chunk", r"<pubDate>([^<]*)</pubDate>", 1).alias(
            "pub_date"
        ),
    )


def _feed_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: feed of doc d carries 1 + d%3 items; item i
    has title 'Post <d>-<i>', link https://<source>.example/post/<d>/<i>
    and pubDate 2024-01-0<i+1>, after a channel title decoy."""
    docs = load(spark, sf_dir, "documents")

    def item(i: int) -> Column:
        return F.concat(
            F.lit(f"<item><title>Post "), F.col("doc_id").cast("string"),
            F.lit(f"-{i}</title><link>https://"), F.col("source"),
            F.lit(".example/post/"), F.col("doc_id").cast("string"),
            F.lit(f"/{i}</link><pubDate>2024-01-0{i + 1}</pubDate></item>"),
        )

    page = F.concat(
        F.lit("<rss><channel><title>Channel decoy</title>"),
        item(0),
        F.when(F.col("doc_id") % 3 >= 1, item(1)).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 3 >= 2, item(2)).otherwise(F.lit("")),
        F.lit("</channel></rss>"),
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/feed"),
        F.col("doc_id").cast("string"), F.lit(".xml"),
    )
    return docs.select(url.alias("url"), page.alias("page"))


@register(
    "feed_items_parse",
    oracle="""
    SELECT 'https://' || source || '.example/feed'
             || CAST(doc_id AS VARCHAR) || '.xml' AS feed_url,
           'Post ' || CAST(doc_id AS VARCHAR) || '-' || CAST(t.i AS VARCHAR)
             AS item_title,
           'https://' || source || '.example/post/'
             || CAST(doc_id AS VARCHAR) || '/' || CAST(t.i AS VARCHAR)
             AS item_link,
           '2024-01-0' || CAST(t.i + 1 AS VARCHAR) AS pub_date
    FROM documents, UNNEST(generate_series(0, doc_id % 3)) AS t(i)
    """,
)
def feed_items_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS item parse value-hash-checked end-to-end: a variable item
    count per feed (1 + doc_id%3) re-derived by the oracle with
    generate_series, channel-title decoy in every payload."""
    return feed_items(_feed_pages(spark, sf_dir))


# ---------------------------------------------------------------------------
# IBAN detection + ISO 13616 mod-97 validation
# ---------------------------------------------------------------------------


def iban_validate_de(text: Column) -> tuple[Column, Column]:
    """(iban, valid) for the first German IBAN in `text`. ISO 13616:
    move the leading 'DE' + check digits behind the BBAN, expand
    letters (D=13, E=14), and the 24-digit number must be ≡ 1 mod 97.
    24 decimal digits fit decimal(38,0), so the remainder is a single
    JVM decimal op — the general-alphabet fold (any country code) would
    use F.aggregate over the char array; the fixed-country fast path
    keeps the whole predicate in codegen."""
    iban = F.regexp_extract(text, r"\bDE[0-9]{20}\b", 0)
    rearranged = F.concat(
        F.substring(iban, 5, 18), F.lit("1314"), F.substring(iban, 3, 2)
    )
    valid = (
        (rearranged.cast("decimal(38,0)") % 97 == 1).cast("int")
    )
    return iban, valid


def _iban_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: doc d's text embeds one IBAN-shaped token
    'DE' + lpad(d%100, 2) + lpad(d, 18) between prose; whether it
    passes mod-97 is decided by the arithmetic, not the construction —
    both engines must agree on which check digits happen to be
    valid."""
    docs = load(spark, sf_dir, "documents")
    iban = F.concat(
        F.lit("DE"), F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lpad(F.col("doc_id").cast("string"), 18, "0"),
    )
    text = F.concat(
        F.lit("invoice ref "), iban, F.lit(" due on receipt"),
    )
    return docs.select("doc_id", text.alias("text"))


@register(
    "pii_iban_mod97",
    oracle="""
    WITH built AS (
      SELECT doc_id,
             'DE' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                  || lpad(CAST(doc_id AS VARCHAR), 18, '0') AS iban
      FROM documents
    )
    SELECT doc_id, iban,
           CAST(CASE WHEN CAST(
                  substr(iban, 5, 18) || '1314' || substr(iban, 3, 2)
                  AS HUGEINT) % 97 = 1 THEN 1 ELSE 0 END AS INT)
             AS valid_iban
    FROM built
    """,
)
def pii_iban_mod97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IBAN PII with exact checksum validation, cross-checked: Spark
    detects the token by regex in running text and validates via
    decimal(38,0) mod 97; DuckDB re-derives the token and validates
    via HUGEINT mod 97 — the two engines' big-integer remainders must
    agree on every row. Complements the Luhn card detector
    (`ml/pii_cards.py`) with the second checksummed PII family."""
    d = _iban_docs(spark, sf_dir)
    iban, valid = iban_validate_de(F.col("text"))
    return d.select(
        "doc_id", iban.alias("iban"), valid.alias("valid_iban")
    )


# ---------------------------------------------------------------------------
# microdata (itemscope/itemprop)
# ---------------------------------------------------------------------------


def microdata_fields(pages: DataFrame) -> DataFrame:
    """(url, item_type, item_name) from the first itemscope block —
    the schema.org *attribute* encoding (microdata), complementing the
    script-block encoding (JSON-LD) above. '' when absent."""
    return pages.select(
        "url",
        F.regexp_extract(
            F.col("page"),
            r'itemscope itemtype="https://schema\.org/([^"]*)"', 1,
        ).alias("item_type"),
        F.regexp_extract(
            F.col("page"), r'<span itemprop="name">([^<]*)</span>', 1
        ).alias("item_name"),
    )


def _microdata_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: doc_id%3==0 → Product block, 1 → Article
    block, 2 → no microdata; every page carries an itemprop-free span
    decoy."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    typ = F.when(F.col("doc_id") % 3 == 0, F.lit("Product")).otherwise(
        F.lit("Article")
    )
    block = F.concat(
        F.lit('<div itemscope itemtype="https://schema.org/'), typ,
        F.lit('"><span itemprop="name">Item '), d, F.lit("</span></div>"),
    )
    page = F.concat(
        F.lit("<body><span>decoy</span>"),
        F.when(F.col("doc_id") % 3 != 2, block).otherwise(F.lit("")),
        F.lit("</body>"),
    )
    return docs.select(_page_url("m").alias("url"), page.alias("page"))


@register(
    "microdata_extract",
    oracle="""
    SELECT 'https://' || source || '.example/m' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
           CASE doc_id % 3 WHEN 0 THEN 'Product' WHEN 1 THEN 'Article'
                ELSE '' END AS item_type,
           CASE WHEN doc_id % 3 = 2 THEN ''
                ELSE 'Item ' || CAST(doc_id AS VARCHAR) END AS item_name
    FROM documents
    """,
)
def microdata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Microdata itemscope/itemprop parse value-hash-checked
    end-to-end (decoy span on every page, microdata-free pages yield
    '' sentinels)."""
    return microdata_fields(_microdata_pages(spark, sf_dir))


# ---------------------------------------------------------------------------
# title consensus ladder
# ---------------------------------------------------------------------------


def title_consensus(pages: DataFrame) -> DataFrame:
    """(url, best_title, title_source) — the publisher's most
    authoritative title by fixed precedence: JSON-LD headline >
    og:title > <title> tag (the structured encodings are
    machine-written and survive templating; the title tag is the
    noisiest — the same ladder shape as `ml/pubdate.py`). One codegen
    projection, three regex probes per page."""
    j = _nonempty(F.regexp_extract(F.col("page"), _LD_BLOCK, 1))
    ld = F.get_json_object(j, "$.headline")
    og = _nonempty(
        F.regexp_extract(
            F.col("page"), '<meta property="og:title" content="([^"]*)"', 1
        )
    )
    tt = _nonempty(
        F.regexp_extract(F.col("page"), r"<title>([^<]*)</title>", 1)
    )
    best = F.coalesce(ld, og, tt, F.lit(""))
    src = (
        F.when(ld.isNotNull(), F.lit("jsonld"))
        .when(og.isNotNull(), F.lit("og"))
        .when(tt.isNotNull(), F.lit("title_tag"))
        .otherwise(F.lit(""))
    )
    return pages.select(
        "url", best.alias("best_title"), src.alias("title_source")
    )


def _titled_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: doc_id%4==0 carries all three sources (J/O/T
    values), 1 carries og + title tag, 2 carries the title tag only,
    3 carries none."""
    docs = load(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    b = F.col("doc_id") % 4
    ld = F.concat(
        F.lit('<script type="application/ld+json">{"headline":"J'), d,
        F.lit('"}</script>'),
    )
    og = F.concat(
        F.lit('<meta property="og:title" content="O'), d, F.lit('">')
    )
    tt = F.concat(F.lit("<title>T"), d, F.lit("</title>"))
    page = F.concat(
        F.lit("<head>"),
        F.when(b == 0, ld).otherwise(F.lit("")),
        F.when(b <= 1, og).otherwise(F.lit("")),
        F.when(b <= 2, tt).otherwise(F.lit("")),
        F.lit("</head>"),
    )
    return docs.select(_page_url("t").alias("url"), page.alias("page"))


@register(
    "title_consensus_ladder",
    oracle="""
    SELECT 'https://' || source || '.example/t' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
           CASE doc_id % 4
             WHEN 0 THEN 'J' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN 'O' || CAST(doc_id AS VARCHAR)
             WHEN 2 THEN 'T' || CAST(doc_id AS VARCHAR)
             ELSE '' END AS best_title,
           CASE doc_id % 4
             WHEN 0 THEN 'jsonld' WHEN 1 THEN 'og'
             WHEN 2 THEN 'title_tag' ELSE '' END AS title_source
    FROM documents
    """,
)
def title_consensus_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The title precedence ladder value-hash-checked end-to-end: the
    oracle re-derives the winning title AND its source tier from the
    construction rule across all four presence combinations."""
    return title_consensus(_titled_pages(spark, sf_dir))


# ---------------------------------------------------------------------------
# rel=next/prev pagination-chain assembly
# ---------------------------------------------------------------------------


def pagination_chains(pages: DataFrame) -> DataFrame:
    """(url, chain_head, page_seq) — stitch multi-page articles back
    together from their `<link rel="prev">` head links. Page 1 of each
    article carries no prev link and anchors the chain; every other
    page resolves to it by pointer doubling (`ml/redirects.py`
    `resolve_redirects` over the prev edges — log2(chain length)
    shuffle rounds, chains up to 2^ROUNDS=8 pages), with the hop count
    doubling as the 0-based page sequence. The edge frame is slim
    (two url strings per paginated page); the payload never enters the
    iteration."""
    from readur_spark.ml.redirects import resolve_redirects

    prev = F.regexp_extract(
        F.col("page"), '<link rel="prev" href="([^"]*)"', 1
    )
    parsed = pages.select("url", prev.alias("prev_url"))
    edges = parsed.where(F.col("prev_url") != "").select(
        F.col("url").alias("src_url"), F.col("prev_url").alias("dst_url")
    )
    heads = parsed.where(F.col("prev_url") == "").select(
        "url",
        F.col("url").alias("chain_head"),
        F.lit(0).cast("long").alias("page_seq"),
    )
    rest = resolve_redirects(edges).select(
        F.col("src_url").alias("url"),
        F.col("final_url").alias("chain_head"),
        F.col("hops").alias("page_seq"),
    )
    return heads.unionByName(rest)


def _paged_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Construction rule: article c = doc_id DIV 4 spans the four pages
    doc_id 4c..4c+3 (doc_ids are contiguous and the table size is a
    multiple of 4 in every fixture); page position p = doc_id % 4
    carries rel=prev to position p-1 (absent at p=0) and rel=next to
    p+1 (absent at p=3), plus a stylesheet decoy link."""
    docs = load(spark, sf_dir, "documents")

    def art(expr: Column) -> Column:
        return F.concat(
            F.lit("https://pages.example/art"), expr.cast("string"),
            F.lit(".html"),
        )

    pos = F.col("doc_id") % 4
    prev_link = F.concat(
        F.lit('<link rel="prev" href="'), art(F.col("doc_id") - 1),
        F.lit('">'),
    )
    next_link = F.concat(
        F.lit('<link rel="next" href="'), art(F.col("doc_id") + 1),
        F.lit('">'),
    )
    page = F.concat(
        F.lit('<head><link rel="stylesheet" href="/s.css">'),
        F.when(pos > 0, prev_link).otherwise(F.lit("")),
        F.when(pos < 3, next_link).otherwise(F.lit("")),
        F.lit("</head>"),
    )
    return docs.select(art(F.col("doc_id")).alias("url"), page.alias("page"))


@register(
    "pagination_chain_assembly",
    oracle="""
    SELECT 'https://pages.example/art' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
           'https://pages.example/art'
             || CAST(doc_id - (doc_id % 4) AS VARCHAR) || '.html'
             AS chain_head,
           CAST(doc_id % 4 AS BIGINT) AS page_seq
    FROM documents
    """,
)
def pagination_chain_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=prev chain assembly value-hash-checked end-to-end: the
    oracle re-derives every page's chain head and sequence from the
    construction rule while Spark parses the links and resolves the
    chains by pointer doubling."""
    return pagination_chains(_paged_pages(spark, sf_dir))
