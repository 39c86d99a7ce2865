"""URL-level curation gates: the first stage of a web-crawl pipeline.

The public curation recipes (C4, RefinedWeb, FineWeb) all filter on the
URL before touching page bytes: domain blocklists (the UT1 adult/
malware lists in RefinedWeb), keyword gates on the URL string, and
structural sanity (IP hosts, ports, absurd lengths). Dropping a page
here costs a string compare; dropping it after extraction costs a
fetch + parse — at 10^12 pages the order matters.

The reference engine's nearest analogue is its source-scope allow/deny
configuration (WebDAV/S3 source folder filters, src/services/
source_sync.rs) — generalized here to open-web URL hygiene.

Scale design:
  - host/domain parsing is pure Catalyst regex/array ops on the url
    column — codegen, no Python, no shuffle;
  - the blocklist joins on the REGISTRABLE domain (last-two-labels
    approximation of eTLD+1 — a public-suffix list would refine
    multi-label TLDs like co.uk; documented deviation), broadcast:
    even the UT1 list (~4M domains) is a few hundred MB broadcast,
    against which the corpus never shuffles;
  - all gates produce boolean columns so Catalyst can push the
    conjunction into the scan when the caller filters immediately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import SYNTH_URL_SQL, load, synthetic_url

# Shared regexes — Java and RE2/DuckDB agree on this subset.
HOST_RE = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"
IP_HOST_RE = r"^\d+\.\d+\.\d+\.\d+$"
# explicit port in the authority (the host class stops at ':', so the
# port must be matched on the raw url, not the parsed host)
PORT_RE = r"^[a-z][a-z0-9+.-]*://[^/?#]*:\d+"
# C4-style URL keyword gate (the public recipe's token idea, tiny
# illustrative list — swap for a full soup list in production).
URL_BADWORD_RE = "(porn|casino|viagra|xxx)"
MAX_URL_LEN = 2048


def url_host(url: Column) -> Column:
    """Lowercased host part of the url ('' when unparseable)."""
    return F.regexp_extract(F.lower(url), HOST_RE, 1)


def registrable_domain(host: Column) -> Column:
    """Last-two-labels approximation of the registrable (eTLD+1)
    domain: 'a.b.example.com' -> 'example.com'."""
    parts = F.split(host, r"\.")
    return F.when(
        F.size(parts) >= 2,
        F.concat(
            F.element_at(parts, -2), F.lit("."), F.element_at(parts, -1)
        ),
    ).otherwise(host)


def with_url_gates(
    df: DataFrame,
    blocklist: DataFrame | None = None,
    *,
    url_col: str = "url",
) -> DataFrame:
    """Adds host, domain, and the gate booleans + an overall url_keep.

    `blocklist` is a 1-column DataFrame (`domain`) of blocked
    registrable domains; it is broadcast — pass the UT1-style list as
    a small dimension table, never a literal IN-list.
    """
    url = F.col(url_col)
    host = url_host(url)
    out = df.withColumn("host", host).withColumn(
        "domain", registrable_domain(F.col("host"))
    )
    gates = {
        "url_bad_host": F.col("host") == "",
        "url_ip_host": F.col("host").rlike(IP_HOST_RE),
        "url_has_port": F.lower(url).rlike(PORT_RE),
        "url_too_long": F.length(url) > MAX_URL_LEN,
        "url_badword": F.lower(url).rlike(URL_BADWORD_RE),
    }
    for name, cond in gates.items():
        out = out.withColumn(name, cond)
    if blocklist is not None:
        hit = (
            blocklist.select(F.col("domain").alias("domain"))
            .distinct()
            .withColumn("url_blocked_domain", F.lit(True))
        )
        out = out.join(F.broadcast(hit), "domain", "left").withColumn(
            "url_blocked_domain",
            F.coalesce(F.col("url_blocked_domain"), F.lit(False)),
        )
    else:
        out = out.withColumn("url_blocked_domain", F.lit(False))
    keep = ~(
        F.col("url_bad_host")
        | F.col("url_ip_host")
        | F.col("url_has_port")
        | F.col("url_too_long")
        | F.col("url_badword")
        | F.col("url_blocked_domain")
    )
    return out.withColumn("url_keep", keep)


# ---- driver-contract query ---------------------------------------------

_BLOCKED = ["src3.example", "src7.example"]
_BLOCKED_SQL = "('src3.example'), ('src7.example')"


@register(
    "url_filter_gates",
    oracle=rf"""
    WITH u AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ),
    h AS (
      SELECT doc_id, url,
             regexp_extract(lower(url), '{HOST_RE}', 1) AS host
      FROM u
    ),
    d AS (
      SELECT doc_id, url, host,
             CASE WHEN len(string_split(host, '.')) >= 2
                  THEN string_split(host, '.')[-2] || '.'
                       || string_split(host, '.')[-1]
                  ELSE host END AS domain
      FROM h
    ),
    bl(domain) AS (VALUES {_BLOCKED_SQL})
    SELECT d.doc_id, d.host, d.domain,
           d.host = '' AS url_bad_host,
           regexp_matches(d.host, '{IP_HOST_RE}') AS url_ip_host,
           regexp_matches(lower(d.url), '^[a-z][a-z0-9+.-]*://[^/?#]*:\d+') AS url_has_port,
           length(d.url) > {MAX_URL_LEN} AS url_too_long,
           regexp_matches(lower(d.url), '{URL_BADWORD_RE}') AS url_badword,
           bl.domain IS NOT NULL AS url_blocked_domain,
           NOT (d.host = '' OR regexp_matches(d.host, '{IP_HOST_RE}')
                OR regexp_matches(lower(d.url), '^[a-z][a-z0-9+.-]*://[^/?#]*:\d+') OR length(d.url) > {MAX_URL_LEN}
                OR regexp_matches(lower(d.url), '{URL_BADWORD_RE}')
                OR bl.domain IS NOT NULL) AS url_keep
    FROM d LEFT JOIN bl USING (domain)
    """,
)
def url_filter_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL hygiene gates over the documents table's synthetic urls with
    a 2-domain blocklist — every gate boolean value-hash-checked."""
    docs = load(spark, sf_dir, "documents").withColumn("url", synthetic_url())
    bl = spark.createDataFrame([(d,) for d in _BLOCKED], "domain string")
    out = with_url_gates(docs, bl)
    return out.select(
        "doc_id",
        "host",
        "domain",
        "url_bad_host",
        "url_ip_host",
        "url_has_port",
        "url_too_long",
        "url_badword",
        "url_blocked_domain",
        "url_keep",
    )


def domain_cap_sample(
    df: DataFrame,
    max_per_domain: int,
    *,
    url_col: str = "url",
    key_col: str = "url",
) -> DataFrame:
    """RefinedWeb-style per-domain cap: keep at most `max_per_domain`
    rows per registrable domain, chosen by content-addressed md5 order
    (reproducible across partitionings and engines; no RNG).

    Scale: one shuffle on `domain`; rank within domain is a window
    whose state is one counter per key. Skewed mega-domains are
    exactly the rows this operator exists to cut — the window scans
    a skewed domain's rows but keeps only K, and the rank predicate
    is applied before anything downstream shuffles again.
    """
    from pyspark.sql import Window

    host = url_host(F.col(url_col))
    order = F.md5(F.encode(F.col(key_col), "UTF-8"))
    w = Window.partitionBy("domain").orderBy(order.alias("o"), key_col)
    return (
        df.withColumn("domain", registrable_domain(host))
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= max_per_domain)
    )


@register(
    "domain_cap_sample",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ),
    d AS (
      SELECT doc_id, url,
             regexp_extract(lower(url), '{HOST_RE}', 1) AS host
      FROM u
    ),
    r AS (
      SELECT doc_id,
             CASE WHEN len(string_split(host, '.')) >= 2
                  THEN string_split(host, '.')[-2] || '.'
                       || string_split(host, '.')[-1]
                  ELSE host END AS domain,
             row_number() OVER (
               PARTITION BY CASE WHEN len(string_split(host, '.')) >= 2
                    THEN string_split(host, '.')[-2] || '.'
                         || string_split(host, '.')[-1]
                    ELSE host END
               ORDER BY md5(url), url
             ) AS domain_rank
      FROM d
    )
    SELECT doc_id, domain, CAST(domain_rank AS BIGINT) AS domain_rank
    FROM r WHERE domain_rank <= 10
    """,
)
def domain_cap_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap documents at 10 per registrable domain, content-addressed —
    winners and ranks value-hash-checked against DuckDB."""
    docs = load(spark, sf_dir, "documents").withColumn("url", synthetic_url())
    out = domain_cap_sample(docs, 10)
    return out.select("doc_id", "domain", "domain_rank")


# ---- IDN homograph detection (UTS #39 confusable skeleton, subset) -------

# Cyrillic/Greek letters visually confusable with Latin (the classic
# IDN-spoofing alphabet; UTS #39 confusablesSummary, re-implemented
# from the published table's Latin-target subset). translate() maps
# them to their Latin skeletons on every engine.
CONFUSABLE_SRC = "аеорсѕхуіјԁɡονα"
CONFUSABLE_DST = "aeopcsxyijdgova"


def confusable_skeleton(col: Column) -> Column:
    """Latin skeleton of a hostname under the confusable subset —
    equal skeletons with unequal raw forms = a homograph pair."""
    return F.translate(F.lower(col), CONFUSABLE_SRC, CONFUSABLE_DST)


def homograph_pairs(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """(skeleton, spoof_host, legit_host) — host pairs that collapse to
    one skeleton where exactly one side is pure-ASCII (the spoof is the
    non-ASCII member; an all-ASCII collision is just a different host).

    Scale: hosts is already host-granular (corpus-distinct — millions,
    not trillions); the self-join keys on the skeleton hash so each
    task sees one skeleton bucket. A crawl frontier runs this against
    its OWN host table to refuse spoofed enqueue targets."""
    sk = (
        hosts.select(F.col(host_col).alias("h"))
        .distinct()
        .withColumn("skeleton", confusable_skeleton(F.col("h")))
        .withColumn("is_ascii", (F.col("h") == F.col("skeleton")).cast("int"))
    )
    spoof = sk.filter(F.col("is_ascii") == 0).select(
        "skeleton", F.col("h").alias("spoof_host")
    )
    legit = sk.filter(F.col("is_ascii") == 1).select(
        "skeleton", F.col("h").alias("legit_host")
    )
    return spoof.join(legit, "skeleton")


# constructed spoofs: every doc_id % 11 == 0 contributes a host whose
# 'a' and 'e' are Cyrillic (U+0430, U+0435) — same skeleton as the
# legit source host
_SPOOF_SQL = f"""
  SELECT DISTINCT
         CASE WHEN doc_id % 11 = 0
              THEN replace(replace(source || '.example', 'a', 'а'),
                           'e', 'е')
              ELSE source || '.example' END AS host
  FROM documents
"""


@register(
    "idn_homograph_pairs",
    oracle=f"""
    WITH hosts AS ({_SPOOF_SQL}),
    sk AS (
      SELECT host AS h,
             translate(lower(host), '{CONFUSABLE_SRC}', '{CONFUSABLE_DST}')
               AS skeleton
      FROM hosts
    )
    SELECT s.skeleton, s.h AS spoof_host, l.h AS legit_host
    FROM (SELECT * FROM sk WHERE h <> skeleton) s
    JOIN (SELECT * FROM sk WHERE h = skeleton) l USING (skeleton)
    """,
)
def idn_homograph_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusable-skeleton homograph pairs over a constructed host set
    (Cyrillic а/е injected by modulo rule) — skeletons, ASCII split,
    and the pair join all value-hashed in DuckDB."""
    docs = load(spark, sf_dir, "documents")
    hosts = docs.select(
        F.when(
            F.col("doc_id") % 11 == 0,
            F.replace(
                F.replace(
                    F.concat(F.col("source"), F.lit(".example")),
                    F.lit("a"),
                    F.lit("а"),
                ),
                F.lit("e"),
                F.lit("е"),
            ),
        )
        .otherwise(F.concat(F.col("source"), F.lit(".example")))
        .alias("host")
    ).distinct()
    return homograph_pairs(hosts)


# ---- crawl yield by URL depth (r5s11) --------------------------------------
#
# Frontier-tuning diagnostic: extraction yield falls off with URL path
# depth on most sites (deep pages are calendars, facets, pagination
# tails), so crawlers cap or de-prioritize depth. This publishes the
# evidence table. The synthetic corpus's URLs are flat, so the path is
# CONSTRUCTED deterministically — doc_id % 5 segments (seg0/seg1/…),
# replayed by both engines — while the yield bit is the real corpus's
# own word-count gate.

YIELD_MIN_WORDS = 50


def depth_yield_table(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(depth, n_docs, n_kept, yield_permille) — kept = clears the
    word-count floor. depth = path segments of the url. One projection
    + one map-side-combinable rollup."""
    path = F.regexp_replace(F.col(url_col), r"^https?://[^/]+", "")
    depth = (
        F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
        .cast("long")
        .alias("depth")
    )
    kept = (
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        )
        >= YIELD_MIN_WORDS
    )
    base = docs.select(depth, kept.alias("kept"))
    return base.groupBy("depth").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
    ).select(
        "depth",
        "n_docs",
        "n_kept",
        F.expr("(1000L * n_kept) div n_docs").alias("yield_permille"),
    )


@register(
    "crawl_depth_yield",
    oracle=f"""
    WITH docs AS (
      SELECT 'https://' || source || '.example' ||
             CASE WHEN doc_id % 5 = 0 THEN '/'
                  ELSE list_aggregate(
                         list_transform(range(0, doc_id % 5),
                                        i -> '/seg' || i),
                         'string_agg', '') || '/'
             END || 'doc' || doc_id || '.html' AS url,
             text
      FROM documents
    ), base AS (
      SELECT CAST(len(list_filter(
               string_split(regexp_replace(url, '^https?://[^/]+', ''),
                            '/'),
               s -> s <> '')) AS BIGINT) AS depth,
             len(list_filter(regexp_split_to_array(text, '\\s+'),
                             t -> t <> '')) >= {YIELD_MIN_WORDS} AS kept
      FROM docs
    )
    SELECT depth, count(*) AS n_docs,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST((1000 * sum(CASE WHEN kept THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS yield_permille
    FROM base GROUP BY depth
    """,
)
def crawl_depth_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yield-by-depth over constructed paths (doc_id % 5 segments),
    value-hashed: DuckDB replays the path construction, the depth
    parse, the real word-count gate, and the rollup."""
    docs = load(spark, sf_dir, "documents")
    seg = F.expr(
        "if(doc_id % 5 = 0, '/', "
        "array_join(transform(sequence(0, cast(doc_id % 5 as int) - 1), "
        "i -> concat('/seg', cast(i as string))), '') || '/')"
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example"), seg,
        F.lit("doc"), F.col("doc_id").cast("string"), F.lit(".html"),
    )
    shaped = docs.select(url.alias("url"), "text")
    return depth_yield_table(shaped)
