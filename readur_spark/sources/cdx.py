"""CDX(J) capture-index tier: SURT urlkeys, record parsing, fetch plans.

A 10^12-document Common-Crawl-style run does not start from WARC bytes
— it starts from the capture INDEX (CDXJ: one line per capture,
`<urlkey> <timestamp14> <json>` where the JSON carries url / mime /
status / payload digest / member offset+length / WARC filename). The
index is ~10^-3 the bytes of the payload tier, so every decision that
CAN be made on the index (which capture of a url to fetch, which
captures are byte-identical revisits, which byte ranges to read from
which WARC file) MUST be made there before a single payload byte
moves. This module is that tier; `sources/warc.py` consumes the plan
it emits. The reference engine ingests a directory of files and has
no index analogue (nearest: its ignored-files + dedup-policy gate,
src/ingestion/file_service.rs — the "decide before you read bytes"
role), so this is crawl-tier extension surface like `ml/robots.py`.

Components (all pure Catalyst — zero Python in any plan here):

  - `surt_urlkey` — the CDX default-canonicalizer subset as a single
    codegen projection: lowercase, scheme dropped, `www\\d*.` prefix
    dropped, default ports (:80/:443) dropped (non-default kept),
    host labels reversed comma-joined, query params session-stripped
    (utm_*/jsessionid/sid/phpsessid/gclid/fbclid) + sorted, fragment
    dropped, empty path -> '/'.  `com,example)/path?a=1&b=2` shape.
  - `cdxj_line` / `parse_cdxj` — format and parse CDXJ lines
    (split-limit-3 + `get_json_object`; JSON may contain spaces).
  - `latest_capture` — one max_by-struct aggregate per urlkey (the
    standard "newest capture wins" index collapse). Map-side
    combinable; the ONLY shuffle is on urlkey, which is the natural
    partition key of the whole pipeline (BASELINE url-hash rule).
  - `capture_rollup` — per-urlkey capture count vs distinct payload
    digests (revisit records share the digest of the capture they
    deduplicate against; n_captures - n_payloads = fetches saved).
  - `fetch_spans` — gaps-and-islands coalescing of (offset,length)
    ranges per WARC file into contiguous read spans when the gap
    between members is <= `gap` bytes: at scale the fetch job issues
    one ranged GET per SPAN, not per record — island detection is a
    lag window per filename, and filename is a bounded partition key
    (one WARC file holds ~10^4-10^5 members, never skewed).

Correctness: the registered queries build CDXJ lines from the
driver's `documents` table by a deterministic construction rule
(messy mixed-case urls with default and non-default ports, session
params, 1-3 captures per doc, paired revisit digests, 7 WARC files)
and the DuckDB oracles re-derive the expected urlkeys / parsed
fields / collapse / spans straight from the rule — a canonicalizer or
parser that drops a single character diverges on the value hash.
Hostile inputs are pinned in tests/test_cdx.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# query params the CDX default canonicalizer strips (session/tracking
# identifiers that multiply urlkeys without changing the payload)
SESSION_PARAM_RE = r"^(utm_[a-z0-9_]+|jsessionid|sid|phpsessid|gclid|fbclid)="

# fetch_spans default: coalesce ranged reads when the dead bytes
# between two members are <= this (a 250 B seek is cheaper than a new
# GET; real deployments tune this to the object store's latency curve)
DEFAULT_COALESCE_GAP = 250


# ---------------------------------------------------------------------------
# SURT urlkey (pure Catalyst)
# ---------------------------------------------------------------------------


def surt_urlkey(url: Column) -> Column:
    """CDX default-canonicalizer urlkey as one codegen projection.

    `https://WWW.Site.Example.COM:443/A/B?b=2&utm_source=x&a=1#f`
      -> `com,example,site)/a/b?a=1&b=2`
    Non-default ports survive after the reversed host
    (`org,host,news:8080)/x`). Whole-URL lowercasing mirrors the CDX
    canonicalizer (it folds percent-escapes too — documented subset).
    """
    u = F.lower(url)
    host_port = F.regexp_extract(u, r"^https?://([^/?#]+)", 1)
    # default ports off first, so ':443' never reaches the port slot
    host_port = F.regexp_replace(host_port, r":(80|443)$", "")
    port = F.regexp_extract(host_port, r":(\d+)$", 1)
    hostname = F.regexp_replace(host_port, r":\d+$", "")
    hostname = F.regexp_replace(hostname, r"^www\d*\.", "")
    rev = F.array_join(F.reverse(F.split(hostname, r"\.")), ",")
    key_host = F.when(port == "", rev).otherwise(
        F.concat(rev, F.lit(":"), port)
    )
    path = F.regexp_extract(u, r"^https?://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # literal spaces are %20-escaped (the canonicalizer escapes
    # illegal URI chars; also keeps the CDXJ line's space-delimited
    # framing parseable)
    path = F.regexp_replace(path, " ", "%20")
    rawq = F.regexp_extract(u, r"\?([^#]*)", 1)
    rawq = F.regexp_replace(rawq, " ", "%20")
    params = F.filter(
        F.split(rawq, "&"),
        lambda x: (x != "") & (~x.rlike(SESSION_PARAM_RE)),
    )
    q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        key_host,
        F.lit(")"),
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


# ---------------------------------------------------------------------------
# CDXJ format / parse (pure Catalyst)
# ---------------------------------------------------------------------------


def cdxj_line(
    urlkey: Column,
    ts14: Column,
    url: Column,
    mime: Column,
    status: Column,
    digest: Column,
    length: Column,
    offset: Column,
    filename: Column,
) -> Column:
    """One CDXJ line. Fields are JSON strings (the CDXJ convention —
    numeric length/offset travel quoted)."""
    return F.concat(
        urlkey,
        F.lit(" "),
        ts14.cast("string"),
        F.lit(' {"url":"'),
        url,
        F.lit('","mime":"'),
        mime,
        F.lit('","status":"'),
        status.cast("string"),
        F.lit('","digest":"'),
        digest,
        F.lit('","length":"'),
        length.cast("string"),
        F.lit('","offset":"'),
        offset.cast("string"),
        F.lit('","filename":"'),
        filename,
        F.lit('"}'),
    )


def parse_cdxj(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ lines -> typed capture records.

    split(limit=3) isolates the JSON blob even when the url field
    contains spaces; field extraction is `get_json_object` (JVM-side,
    no Python). Malformed lines (missing fields) surface as nulls —
    filter on `offset IS NOT NULL` downstream if the feed is dirty.
    """
    parts = F.split(F.col(line_col), " ", 3)
    # F.get (not getItem): a truncated line yields NULL fields, not an
    # ANSI INVALID_ARRAY_INDEX task failure
    j = F.get(parts, 2)

    def js(field: str) -> Column:
        return F.get_json_object(j, f"$.{field}")

    return lines.select(
        F.get(parts, 0).alias("urlkey"),
        F.get(parts, 1).alias("capture_ts"),
        js("url").alias("url"),
        js("mime").alias("mime"),
        js("status").alias("status"),
        js("digest").alias("digest"),
        js("length").cast("long").alias("length"),
        js("offset").cast("long").alias("offset"),
        js("filename").alias("filename"),
    )


# ---------------------------------------------------------------------------
# Index-tier operators
# ---------------------------------------------------------------------------


def latest_capture(records: DataFrame) -> DataFrame:
    """Newest capture per urlkey: ONE aggregate, max_by on the
    (capture_ts, url, digest) struct — map-side combinable, so the
    shuffle carries one row per urlkey, not one per capture. This is
    the index collapse every snapshot-merge run does first."""
    best = F.max(
        F.struct(
            F.col("capture_ts"),
            F.col("url"),
            F.col("digest"),
            F.col("mime"),
            F.col("status"),
        )
    ).alias("b")
    return records.groupBy("urlkey").agg(best).select(
        "urlkey",
        F.col("b.capture_ts").alias("capture_ts"),
        F.col("b.url").alias("url"),
        F.col("b.digest").alias("digest"),
        F.col("b.mime").alias("mime"),
        F.col("b.status").alias("status"),
    )


def capture_rollup(records: DataFrame) -> DataFrame:
    """Per-urlkey capture count vs distinct payloads. The difference
    is the revisit savings: captures whose digest matches an earlier
    capture need no payload fetch at all."""
    return records.groupBy("urlkey").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.countDistinct("digest").alias("n_payloads"),
        F.min("capture_ts").alias("first_ts"),
        F.max("capture_ts").alias("last_ts"),
    )


def fetch_spans(
    records: DataFrame, gap: int = DEFAULT_COALESCE_GAP
) -> DataFrame:
    """Coalesce member byte ranges into contiguous read spans per WARC
    file (gaps-and-islands): a new span starts where the hole before a
    member exceeds `gap` bytes. One shuffle on filename (bounded: a
    WARC file holds a bounded member count by construction), one lag +
    one running-sum window inside each file, then a map-side-combinable
    span aggregate. Emitting SPANS, not records, is what turns 10^12
    index rows into a fetch job with ~10^2 ranged GETs per WARC file."""
    w = Window.partitionBy("filename").orderBy("offset")
    end = F.col("offset") + F.col("length")
    prev_end = F.lag(end).over(w)
    new_island = F.when(
        prev_end.isNull() | (F.col("offset") - prev_end > F.lit(gap)),
        F.lit(1),
    ).otherwise(F.lit(0))
    ids = records.select("filename", "offset", "length").withColumn(
        "span_id", F.sum(new_island).over(w)
    )
    return ids.groupBy("filename", "span_id").agg(
        F.min("offset").alias("span_start"),
        F.max(F.col("offset") + F.col("length")).alias("span_end"),
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.sum("length").alias("payload_bytes"),
    ).withColumn(
        "dead_bytes",
        F.col("span_end") - F.col("span_start") - F.col("payload_bytes"),
    )


# ---------------------------------------------------------------------------
# Constructed corpus (deterministic from the documents table)
# ---------------------------------------------------------------------------


def _messy_url() -> Column:
    """The construction rule's raw url: even docs get a mixed-case
    www + default-port + session-param + unsorted-query form; odd docs
    a no-www non-default-port no-query form."""
    d = F.col("doc_id").cast("string")
    k50 = (F.col("doc_id") % 50).cast("string")
    k31 = (F.col("doc_id") % 31).cast("string")
    return F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("https://WWW.Site"), k50, F.lit(".Example.COM:443"),
            F.lit("/Articles/Item"), d,
            F.lit("?b=2&utm_source=feed&a=1#frag"),
        ),
    ).otherwise(
        F.concat(
            F.lit("http://news.Host"), k31, F.lit(".ORG:8080/x"), d
        )
    )


def _constructed_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1 + doc_id%3 captures per doc; capture pairs (0,1) share a
    payload digest (a revisit), capture 2 is fresh; 7 WARC files keyed
    by doc_id%7; offsets on a 1000-byte grid with length 600..899 so
    the hole to the next slot is 101..400 bytes — straddling the
    250-byte coalesce gap from both sides."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    caps = docs.withColumn(
        "c", F.explode(F.sequence(F.lit(0), (F.col("doc_id") % 3)))
    )
    url = _messy_url()
    ts = (
        F.lit(20230101000000) + (F.col("doc_id") % 97) * 10000 + F.col("c")
    ).cast("string")
    digest = F.concat(
        F.lit("sha1:"),
        F.md5(
            F.concat(
                F.lit("dg"),
                (F.col("doc_id") * 4 + F.floor(F.col("c") / 2)).cast(
                    "string"
                ),
            )
        ),
    )
    mime = F.when(
        (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 11 == 0),
        F.lit("application/pdf"),
    ).otherwise(F.lit("text/html"))
    status = F.when(
        (F.col("c") == 0) & (F.col("doc_id") % 13 == 0), F.lit("301")
    ).otherwise(F.lit("200"))
    filename = F.concat(
        F.lit("crawl-2023-"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".warc.gz"),
    )
    offset = (F.col("doc_id") * 4 + F.col("c")) * 1000
    length = F.lit(600) + (F.col("doc_id") % 300)
    return caps.select(
        F.col("doc_id"),
        F.col("c"),
        cdxj_line(
            surt_urlkey(url), ts, url, mime, status, digest,
            length, offset, filename,
        ).alias("line"),
    )


# SQL twins of the construction rule (independent re-derivations —
# they never call the canonicalizer/parser, they restate the rule)
_SQL_URL = """
    CASE WHEN doc_id % 2 = 0 THEN
      'https://WWW.Site' || CAST(doc_id % 50 AS VARCHAR)
        || '.Example.COM:443/Articles/Item' || CAST(doc_id AS VARCHAR)
        || '?b=2&utm_source=feed&a=1#frag'
    ELSE
      'http://news.Host' || CAST(doc_id % 31 AS VARCHAR)
        || '.ORG:8080/x' || CAST(doc_id AS VARCHAR)
    END
"""

_SQL_URLKEY = """
    CASE WHEN doc_id % 2 = 0 THEN
      'com,example,site' || CAST(doc_id % 50 AS VARCHAR)
        || ')/articles/item' || CAST(doc_id AS VARCHAR) || '?a=1&b=2'
    ELSE
      'org,host' || CAST(doc_id % 31 AS VARCHAR)
        || ',news:8080)/x' || CAST(doc_id AS VARCHAR)
    END
"""

_SQL_CAPS = """
    SELECT doc_id, UNNEST(generate_series(0, CAST(doc_id % 3 AS BIGINT)))
             AS c
    FROM documents
"""

_SQL_FIELDS = f"""
    SELECT doc_id, c,
           {_SQL_URLKEY} AS urlkey,
           CAST(20230101000000 + (doc_id % 97) * 10000 + c AS VARCHAR)
             AS capture_ts,
           lower({_SQL_URL}) AS url_lc,
           {_SQL_URL} AS url,
           CASE WHEN doc_id % 2 = 1 AND doc_id % 11 = 0
                THEN 'application/pdf' ELSE 'text/html' END AS mime,
           CASE WHEN c = 0 AND doc_id % 13 = 0
                THEN '301' ELSE '200' END AS status,
           'sha1:' || md5('dg' || CAST(doc_id * 4
               + CAST(floor(c / 2.0) AS BIGINT) AS VARCHAR)) AS digest,
           CAST(600 + doc_id % 300 AS BIGINT) AS length,
           CAST((doc_id * 4 + c) * 1000 AS BIGINT) AS "offset",
           'crawl-2023-' || CAST(doc_id % 7 AS VARCHAR) || '.warc.gz'
             AS filename
    FROM ({_SQL_CAPS})
"""


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "cdx_urlkey_surt",
    oracle=f"""
    SELECT doc_id, {_SQL_URLKEY} AS urlkey
    FROM documents
    """,
)
def cdx_urlkey_surt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT urlkey over messy constructed urls; the oracle states the
    expected key straight from the construction rule (case folds, www
    and :443 vanish, :8080 survives, session param dropped, query
    sorted, fragment gone)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", surt_urlkey(_messy_url()).alias("urlkey")
    )


@register(
    "cdx_parse_records",
    oracle=f"""
    SELECT urlkey, capture_ts, url, mime, status, digest,
           length, "offset", filename
    FROM ({_SQL_FIELDS})
    """,
)
def cdx_parse_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format + reparse round-trip: build CDXJ lines from the rule,
    parse with the kernel, compare every typed field against the
    rule's SQL restatement. Note the parsed url keeps its original
    case (only the urlkey canonicalizes) — the oracle asserts that
    too."""
    recs = parse_cdxj(_constructed_records(spark, sf_dir))
    return recs.select(
        "urlkey", "capture_ts", "url", "mime", "status", "digest",
        "length", "offset", "filename",
    )


@register(
    "cdx_latest_capture",
    oracle=f"""
    WITH f AS ({_SQL_FIELDS}),
    r AS (
      SELECT urlkey, capture_ts, url, digest, mime, status,
             row_number() OVER (
               PARTITION BY urlkey
               ORDER BY capture_ts DESC, url DESC, digest DESC
             ) AS rn
      FROM f
    )
    SELECT urlkey, capture_ts, url, digest, mime, status
    FROM r WHERE rn = 1
    """,
)
def cdx_latest_capture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newest-capture collapse (capture_ts is distinct per urlkey by
    construction, so max_by-struct and the oracle's window agree)."""
    return latest_capture(parse_cdxj(_constructed_records(spark, sf_dir)))


@register(
    "cdx_capture_rollup",
    oracle=f"""
    SELECT urlkey,
           CAST(count(*) AS BIGINT) AS n_captures,
           CAST(count(DISTINCT digest) AS BIGINT) AS n_payloads,
           min(capture_ts) AS first_ts,
           max(capture_ts) AS last_ts
    FROM ({_SQL_FIELDS})
    GROUP BY urlkey
    """,
)
def cdx_capture_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revisit accounting: docs with 2 captures collapse to 1 payload
    (paired digests), docs with 3 captures to 2."""
    return capture_rollup(parse_cdxj(_constructed_records(spark, sf_dir)))


@register(
    "cdx_fetch_spans",
    oracle=f"""
    WITH f AS ({_SQL_FIELDS}),
    lagged AS (
      SELECT filename, "offset", length,
             lag("offset" + length) OVER (
               PARTITION BY filename ORDER BY "offset"
             ) AS prev_end
      FROM f
    ),
    flagged AS (
      SELECT filename, "offset", length,
             CASE WHEN prev_end IS NULL
                    OR "offset" - prev_end > {DEFAULT_COALESCE_GAP}
                  THEN 1 ELSE 0 END AS ni
      FROM lagged
    ),
    ids AS (
      SELECT filename, "offset", length,
             sum(ni) OVER (
               PARTITION BY filename ORDER BY "offset"
               ROWS UNBOUNDED PRECEDING
             ) AS span_id
      FROM flagged
    )
    SELECT filename, CAST(span_id AS BIGINT) AS span_id,
           min("offset") AS span_start,
           max("offset" + length) AS span_end,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(length) AS BIGINT) AS payload_bytes,
           CAST(max("offset" + length) - min("offset") - sum(length)
                AS BIGINT) AS dead_bytes
    FROM ids
    GROUP BY filename, span_id
    """,
)
def cdx_fetch_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranged-read plan: per-WARC-file islands under the 250-byte
    coalesce gap. The construction straddles the gap (hole is
    400 - doc_id%300), so both merge and split branches carry rows."""
    return fetch_spans(parse_cdxj(_constructed_records(spark, sf_dir)))


@register(
    "cdx_frontier_diff",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN {_SQL_URLKEY}
                  ELSE 'org,site' || CAST(doc_id % 9 AS VARCHAR)
                       || ',new)/fresh' || CAST(doc_id AS VARCHAR) END
               AS urlkey,
             doc_id % 3 <> 0 AS is_new
      FROM documents
    )
    SELECT doc_id, urlkey, is_new,
           CASE WHEN is_new THEN NULL
                ELSE CAST(20230101000000 + (doc_id % 97) * 10000
                          AS VARCHAR) END AS last_capture_ts
    FROM f
    """,
)
def cdx_frontier_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-aware frontier triage: candidate urls canonicalized to
    urlkeys and left-joined against the index's newest-capture table —
    never-captured urls come out `is_new` (the discovery set the
    fetcher prioritizes), known urls carry their latest capture
    timestamp (the revisit-scheduler's input, `crawl_revisit_schedule`
    downstream). One broadcast-or-shuffle join on urlkey, the
    pipeline's natural partition key; the index side is the slim
    latest_capture collapse, never raw captures. Constructed frontier:
    every doc_id % 3 == 0 url is already in the constructed index
    (where its capture count is 1, so its latest ts is the c = 0
    row); the rest are novel urls the index has never seen."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id").cast("string")
    novel = F.concat(
        F.lit("https://NEW.Site"), (F.col("doc_id") % 9).cast("string"),
        F.lit(".ORG/Fresh"), d,
    )
    url = F.when(F.col("doc_id") % 3 == 0, _messy_url()).otherwise(novel)
    frontier = docs.select(
        "doc_id", surt_urlkey(url).alias("urlkey")
    )
    index = latest_capture(
        parse_cdxj(_constructed_records(spark, sf_dir))
    ).select("urlkey", F.col("capture_ts").alias("last_capture_ts"))
    return (
        frontier.join(index, "urlkey", "left")
        .select(
            "doc_id", "urlkey",
            F.col("last_capture_ts").isNull().alias("is_new"),
            "last_capture_ts",
        )
    )
