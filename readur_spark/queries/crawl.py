"""Crawl-snapshot operators: capture-over-capture diff and URL
canonicalization.

A Common-Crawl-style ingest sees the same url across captures
(WARC-Target-URI recurrence — the contract readur resolves with its
dedup policies, src/services/file_service.rs; sources/warc.py
canonicalizes to latest-capture-per-url at ingest). These operators
answer the next question: *what changed between two captures?* and
*which distinct urls are actually the same resource?*

Scale notes:
* `crawl_snapshot_diff` is one full-outer join keyed by url. At 10^12
  rows that is a sort-merge join on hash(url) — both sides partition
  identically, so with the snapshot store's url-bucketed layout
  (operators/checkpoint.py) it degenerates to a zip of co-located
  buckets with no shuffle at all. Content comparison rides sha256
  digests computed in the scan projection (JVM `F.sha2`), so the join
  carries 64-byte digests, never payloads.
* `canonicalize_url` is a pure projection (regexp capture groups, all
  in the Java-regex ∩ RE2 syntax subset) — zero shuffles; grouping by
  the canonical form afterwards is the usual hash-agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import SYNTH_URL_SQL as _URL_SQL
from readur_spark.queries.tables import load, synthetic_url


# ---------------------------------------------------------------------------
# capture diff
# ---------------------------------------------------------------------------

def snapshot_diff(prev: DataFrame, curr: DataFrame) -> DataFrame:
    """Diff two captures of (url, text): added/removed/changed/unchanged.

    Digest-first: each side reduces to (url, sha256) before the join,
    so the shuffle moves 96 bytes/row regardless of document size.
    """
    p = prev.select("url", F.sha2(F.col("text"), 256).alias("h_prev"))
    c = curr.select("url", F.sha2(F.col("text"), 256).alias("h_curr"))
    joined = p.join(c, "url", "full_outer")
    status = (
        F.when(F.col("h_prev").isNull(), "added")
        .when(F.col("h_curr").isNull(), "removed")
        .when(F.col("h_prev") != F.col("h_curr"), "changed")
        .otherwise("unchanged")
    )
    return joined.select("url", status.alias("status"))


@register(
    "crawl_snapshot_diff",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_URL_SQL} AS url, text FROM documents
    ), prev AS (
      SELECT url, sha256(text) AS h_prev FROM base WHERE doc_id % 7 <> 0
    ), curr AS (
      SELECT url,
             sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                         ELSE text END) AS h_curr
      FROM base WHERE doc_id % 11 <> 0
    )
    SELECT COALESCE(prev.url, curr.url) AS url,
           CASE WHEN h_prev IS NULL THEN 'added'
                WHEN h_curr IS NULL THEN 'removed'
                WHEN h_prev <> h_curr THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM prev FULL OUTER JOIN curr ON prev.url = curr.url
    """,
)
def crawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic captures synthesized from `documents` (prev
    misses doc_id%7==0, curr misses %11==0 and revises %5==0), diffed
    through the real `snapshot_diff` operator. All four statuses occur
    at sf0.01."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", synthetic_url().alias("url"), "text")
    prev = base.filter(F.col("doc_id") % 7 != 0).select("url", "text")
    curr = base.filter(F.col("doc_id") % 11 != 0).select(
        "url",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")).alias("text"),
    )
    return snapshot_diff(prev, curr)


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

def canonicalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, strip leading `www.`,
    strip default ports (:80/:443), drop the fragment, trim a trailing
    slash off the path, and sort query parameters.

    The capture regexes stay in the Java-regex ∩ RE2 subset so the
    identical patterns run under DuckDB for the oracle.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1))
    # default-port strip is scheme-conditional: http://h:443 is a real
    # non-default endpoint and must NOT collapse to http://h
    default_port = (
        F.when(scheme == "http", F.lit(":80$"))
        .when(scheme == "https", F.lit(":443$"))
        .otherwise(F.lit("$^"))  # matches nothing
    )
    host = F.regexp_replace(
        F.regexp_replace(hostport, default_port, F.lit("")),
        r"^www\.", "",
    )
    path = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        r"/$", "",
    )
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    qs_sorted = F.array_join(F.array_sort(F.split(qs, "&")), "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs_sorted)).otherwise(F.lit("")),
    )


@register(
    "url_canonicalize",
    oracle="""
    WITH messy AS (
      SELECT doc_id,
             'HTTPS://WWW.' || upper(source) || '.Example:443/Doc' || doc_id
               || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
               || CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1' ELSE '' END
               || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
      FROM documents
    ), schemed AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme
      FROM messy
    ), parts AS (
      SELECT doc_id, url, scheme,
             regexp_replace(regexp_replace(
               lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)),
               CASE WHEN scheme = 'http' THEN ':80$'
                    WHEN scheme = 'https' THEN ':443$'
                    ELSE '$^' END, ''), '^www\\.', '') AS host,
             regexp_replace(
               regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
               '/$', '') AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS qs
      FROM schemed
    )
    SELECT doc_id, url AS raw_url,
           scheme || '://' || host || path ||
             CASE WHEN qs <> ''
                  THEN '?' || array_to_string(list_sort(string_split(qs, '&')), '&')
                  ELSE '' END AS canonical_url
    FROM parts
    """,
)
def url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically-messy urls (case, default port, www, trailing
    slash, unsorted params, fragment) canonicalized by the real
    operator; hash-checked byte-for-byte."""
    docs = load(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW."), F.upper(F.col("source")),
            F.lit(".Example:443/Doc"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, "/").otherwise(""),
            F.when(F.col("doc_id") % 2 == 0, "?b=2&a=1").otherwise(""),
            F.when(F.col("doc_id") % 4 == 0, "#frag").otherwise(""),
        ).alias("url"),
    )
    return messy.select(
        "doc_id",
        F.col("url").alias("raw_url"),
        canonicalize_url(F.col("url")).alias("canonical_url"),
    )


# ---------------------------------------------------------------------------
# ETag normalization (source-sync change detection)
# ---------------------------------------------------------------------------

def normalize_etag_col(etag: Column) -> Column:
    """Catalyst twin of kernels.mime.normalize_etag: one regex strips
    all repeated weak indicators (with interleaved whitespace), one
    strips the surrounding quote pair, and a whitespace-only remainder
    collapses to "" (webdav_xml_parser.rs:562-565). Whitespace handling
    is regex-based (`\\s`) because Spark's trim() strips spaces only,
    while the kernel's str.strip() — like Rust's str::trim — strips
    tabs/newlines too."""
    trimmed = F.regexp_replace(etag, r"^\s+|\s+$", "")
    t = F.regexp_replace(trimmed, r"^([Ww]/\s*)+", "")
    unquoted = F.regexp_replace(t, r'^"(.*)"$', "$1")
    return F.when(unquoted.rlike(r"^\s*$"), F.lit("")).otherwise(unquoted)


@register(
    "etag_normalize",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN '"tag-' || doc_id || '"'
               WHEN 1 THEN 'W/"tag-' || doc_id || '"'
               WHEN 2 THEN '  w/ W/"tag-' || doc_id || '"  '
               WHEN 3 THEN 'tag-' || doc_id
               WHEN 4 THEN 'W/tag-' || doc_id
               ELSE '" "'
             END AS etag
      FROM documents
    ), un AS (
      SELECT doc_id, etag,
             regexp_replace(
               regexp_replace(trim(etag), '^([Ww]/\\s*)+', ''),
               '^"(.*)"$', '\\1') AS u
      FROM seeded
    )
    SELECT doc_id, etag AS raw_etag,
           CASE WHEN trim(u) = '' THEN '' ELSE u END AS etag_n
    FROM un
    """,
)
def etag_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ETag normalization over a deterministic formatting matrix
    (quoted, weak, repeated-weak + whitespace, bare, quoted-whitespace)
    — byte-for-byte hash-checked, including the whitespace-only → ''
    collapse (webdav_xml_parser.rs:562-565)."""
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.element_at(
            F.array(
                F.concat(F.lit('"tag-'), F.col("doc_id").cast("string"), F.lit('"')),
                F.concat(F.lit('W/"tag-'), F.col("doc_id").cast("string"), F.lit('"')),
                F.concat(F.lit('  w/ W/"tag-'), F.col("doc_id").cast("string"), F.lit('"  ')),
                F.concat(F.lit("tag-"), F.col("doc_id").cast("string")),
                F.concat(F.lit("W/tag-"), F.col("doc_id").cast("string")),
                F.lit('" "'),
            ),
            (F.col("doc_id") % 6 + 1).cast("int"),
        ).alias("etag"),
    )
    return seeded.select(
        "doc_id",
        F.col("etag").alias("raw_etag"),
        normalize_etag_col(F.col("etag")).alias("etag_n"),
    )


def sync_change_plan(known: DataFrame, discovered: DataFrame) -> DataFrame:
    """Smart-sync triage (services/webdav/smart_sync.rs:85-115): decide
    BEFORE any download which paths are new (discovered, not known),
    deleted (known, not discovered), changed (etag weak-comparison
    mismatch), or unchanged. ETags are normalized on both sides
    (normalize_etag_col — the ParsedETag weak comparison), so quoting /
    weak-prefix formatting differences never trigger re-downloads.

    One full-outer join keyed by path; both sides reduce to
    (path, normalized etag) first, so the shuffle carries no payloads —
    the same digest-first shape as snapshot_diff."""
    k = known.select("path", normalize_etag_col(F.col("etag")).alias("e_known"))
    d = discovered.select(
        "path", normalize_etag_col(F.col("etag")).alias("e_disc")
    )
    joined = k.join(d, "path", "full_outer")
    status = (
        F.when(F.col("e_known").isNull(), "new")
        .when(F.col("e_disc").isNull(), "deleted")
        .when(F.col("e_known") != F.col("e_disc"), "changed")
        .otherwise("unchanged")
    )
    return joined.select("path", status.alias("status"))


@register(
    "sync_change_plan",
    oracle="""
    WITH base AS (
      SELECT doc_id, '/folder/' || source || '/doc' || doc_id AS path
      FROM documents
    ), known AS (
      -- stored normalized (migration 20250620100020 backfill)
      SELECT path, 'v' || (doc_id % 10) AS e FROM base WHERE doc_id % 7 <> 0
    ), disc AS (
      -- server returns quoted/weak formats; revisions bump the version
      SELECT path,
             CASE WHEN doc_id % 2 = 0
                  THEN 'W/"v' || CASE WHEN doc_id % 5 = 0
                                      THEN (doc_id % 10) + 1
                                      ELSE doc_id % 10 END || '"'
                  ELSE '"v' || CASE WHEN doc_id % 5 = 0
                                    THEN (doc_id % 10) + 1
                                    ELSE doc_id % 10 END || '"'
             END AS e
      FROM base WHERE doc_id % 11 <> 0
    ), norm AS (
      SELECT COALESCE(k.path, d.path) AS path,
             k.e AS ek,
             regexp_replace(regexp_replace(trim(d.e), '^([Ww]/\\s*)+', ''),
                            '^"(.*)"$', '\\1') AS ed
      FROM known k FULL OUTER JOIN disc d ON k.path = d.path
    )
    SELECT path,
           CASE WHEN ek IS NULL THEN 'new'
                WHEN ed IS NULL THEN 'deleted'
                WHEN ek <> ed THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM norm
    """,
)
def sync_change_plan_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync triage over seeded listings: the known side stores
    normalized etags, the discovered side returns quoted/weak formats,
    and every-5th doc carries a genuine revision — so 'changed' fires
    only on real version bumps, never on formatting. All four statuses
    occur at sf0.01."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.concat(
            F.lit("/folder/"), F.col("source"), F.lit("/doc"),
            F.col("doc_id").cast("string"),
        ).alias("path"),
    )
    ver = F.when(
        F.col("doc_id") % 5 == 0, (F.col("doc_id") % 10) + 1
    ).otherwise(F.col("doc_id") % 10).cast("string")
    known = base.filter(F.col("doc_id") % 7 != 0).select(
        "path",
        F.concat(F.lit("v"), (F.col("doc_id") % 10).cast("string")).alias("etag"),
    )
    disc = base.filter(F.col("doc_id") % 11 != 0).select(
        "path",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('W/"v'), ver, F.lit('"')),
        ).otherwise(F.concat(F.lit('"v'), ver, F.lit('"'))).alias("etag"),
    )
    return sync_change_plan(known, disc)


# ---------------------------------------------------------------------------
# politeness scheduling
# ---------------------------------------------------------------------------


def politeness_schedule(
    urls: DataFrame,
    *,
    id_col: str = "doc_id",
    host_col: str = "host",
    key_col: str = "url",
    delay_col: str = "delay_ms",
    priority_col: str | None = None,
) -> DataFrame:
    """Per-host serialized fetch schedule: wave k of a host fetches at
    offset k * crawl_delay. Urls order within a host by md5(key) — a
    content-addressed permutation, so the schedule is reproducible
    under any partitioning or engine.

    Output: (id_col, host_col, wave, offset_ms). One shuffle (the
    per-host window). Politeness is INHERENTLY serial per host, so the
    per-host sort is the work itself, not overhead; a heavy host's long
    partition is the crawl-time reality the schedule exists to expose
    (its max wave IS the host's fetch horizon). Frontier-wide skew
    handling belongs upstream (operators/partitioning.py salting) —
    by the time a schedule is drawn, per-host grouping is the point.
    """
    from pyspark.sql.window import Window

    # default order: content-addressed permutation (reproducible on
    # any engine/partitioning). With `priority_col` (e.g. an OPIC
    # importance), high-priority urls take the EARLY waves and the
    # hash stays as the deterministic tie-break.
    order = [F.md5(F.encode(F.col(key_col), "UTF-8"))]
    if priority_col is not None:
        order = [F.col(priority_col).desc()] + order
    w = Window.partitionBy(host_col).orderBy(*order)
    wave = (F.row_number().over(w) - 1).cast("long")
    return urls.select(
        id_col,
        host_col,
        wave.alias("wave"),
        (wave * F.col(delay_col)).cast("long").alias("offset_ms"),
    )


@register(
    "crawl_politeness_schedule",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, source || '.example' AS host, {_URL_SQL} AS url
      FROM documents
    ),
    d AS (
      SELECT u.*,
             500 + (CAST(concat('0x', substr(md5(host), 1, 8)) AS BIGINT)
                    % 10) * 250 AS delay_ms
      FROM u
    ),
    r AS (
      SELECT doc_id, host, delay_ms,
             CAST(row_number() OVER (PARTITION BY host ORDER BY md5(url))
                  - 1 AS BIGINT) AS wave
      FROM d
    )
    SELECT doc_id, host, wave, CAST(wave * delay_ms AS BIGINT) AS offset_ms
    FROM r
    """,
)
def crawl_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness fetch schedule over the synthetic frontier with an
    md5-derived per-host crawl delay (500-2750 ms — the Crawl-delay
    directive robots.txt would carry, ml/robots.py), value-hash-checked
    per row: wave assignment AND fetch offsets must match exactly."""
    docs = load(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example"))
    delay = (
        F.lit(500)
        + (
            F.conv(F.substring(F.md5(F.encode(host, "UTF-8")), 1, 8), 16, 10)
            .cast("long")
            % 10
        )
        * 250
    ).cast("long")
    urls = docs.select(
        "doc_id",
        host.alias("host"),
        synthetic_url().alias("url"),
        delay.alias("delay_ms"),
    )
    return politeness_schedule(urls).select(
        "doc_id", "host", "wave", "offset_ms"
    )


@register(
    "crawl_frontier_plan",
    oracle=f"""
    WITH u AS MATERIALIZED (
      SELECT doc_id, source || '.example' AS host,
             '/doc' || doc_id || '.txt' AS path,
             {_URL_SQL} AS url
      FROM documents
    ),
    hosts AS MATERIALIZED (SELECT DISTINCT host FROM u),
    rules AS MATERIALIZED (
      SELECT host, '/doc'
               || (CAST(concat('0x', substr(md5(host), 1, 8)) AS BIGINT)
                   % 10) AS prefix,
             false AS allow
      FROM hosts
      UNION ALL
      SELECT host, '/doc'
               || (CAST(concat('0x', substr(md5(host), 1, 8)) AS BIGINT)
                   % 10)
               || (CAST(concat('0x', substr(md5(host || '#2'), 1, 8))
                        AS BIGINT) % 10) AS prefix,
             true AS allow
      FROM hosts
    ),
    cand AS MATERIALIZED (
      SELECT u.doc_id,
             max(struct_pack(l := length(r.prefix), a := r.allow,
                             p := r.prefix)) AS m
      FROM u JOIN rules r USING (host)
      WHERE starts_with(u.path, r.prefix)
      GROUP BY u.doc_id
    ),
    allowed AS MATERIALIZED (
      SELECT u.doc_id, u.host, u.url,
             500 + (CAST(concat('0x', substr(md5(u.host), 1, 8)) AS BIGINT)
                    % 10) * 250 AS delay_ms
      FROM u LEFT JOIN cand c USING (doc_id)
      WHERE coalesce((c.m).a, true)
    ),
    r AS (
      SELECT doc_id, host, delay_ms,
             CAST(row_number() OVER (PARTITION BY host ORDER BY md5(url))
                  - 1 AS BIGINT) AS wave
      FROM allowed
    )
    SELECT doc_id, host, wave, CAST(wave * delay_ms AS BIGINT) AS offset_ms
    FROM r
    """,
)
def crawl_frontier_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPOSED chain: robots gate (ml/robots.py longest-match
    precedence) feeding the politeness scheduler — disallowed urls
    never consume fetch waves, so every downstream offset shifts. The
    DuckDB twin replays rule synthesis, precedence, the allowed-set
    filter AND the re-waved schedule value-for-value; a wrong decision
    anywhere moves some host's whole tail."""
    from readur_spark.ml.robots import _synthetic_rules, longest_match_gate

    docs = load(spark, sf_dir, "documents")
    host = F.concat(F.col("source"), F.lit(".example"))
    urls = docs.select(
        "doc_id",
        host.alias("host"),
        F.concat(
            F.lit("/doc"), F.col("doc_id").cast("string"), F.lit(".txt")
        ).alias("path"),
        synthetic_url().alias("url"),
    )
    gate = longest_match_gate(urls, _synthetic_rules(docs))
    delay = (
        F.lit(500)
        + (
            F.conv(
                F.substring(F.md5(F.encode(F.col("host"), "UTF-8")), 1, 8),
                16,
                10,
            ).cast("long")
            % 10
        )
        * 250
    ).cast("long")
    allowed = (
        urls.join(gate.filter("allowed").select("doc_id"), "doc_id")
        .withColumn("delay_ms", delay)
    )
    return politeness_schedule(allowed).select(
        "doc_id", "host", "wave", "offset_ms"
    )


# ---------------------------------------------------------------------------
# adaptive revisit scheduling
# ---------------------------------------------------------------------------

# Binary-exponential adaptive refetch (the integer-exact form of
# Nutch's AdaptiveFetchSchedule / Cho & Garcia-Molina freshness
# policy): pages that change speed up toward MIN_INTERVAL, pages that
# don't back off toward MAX_INTERVAL; new pages start at DEFAULT and
# removed pages leave the schedule (interval 0).
MIN_INTERVAL_S = 3_600  # 1 hour
DEFAULT_INTERVAL_S = 86_400  # 1 day
MAX_INTERVAL_S = 2_592_000  # 30 days


def revisit_schedule(diff: DataFrame, schedule: DataFrame) -> DataFrame:
    """Next-fetch intervals from a capture diff + the standing
    schedule.

    `diff` is snapshot_diff output (url, status); `schedule` holds the
    KNOWN urls' current intervals (url, interval_s) — 'added' urls are
    absent from it by definition and start at DEFAULT_INTERVAL_S.
    Doubling/halving is exact integer arithmetic; clamps are
    least/greatest, so the whole policy replays bit-for-bit.

    Scale: both sides are slim (url + one long); the join keys match
    snapshot_diff's own url partitioning, so scheduled 10^12-url runs
    reuse the diff's layout with no extra shuffle stage.
    """
    joined = diff.join(schedule, "url", "left")
    nxt = (
        F.when(F.col("status") == "added", F.lit(DEFAULT_INTERVAL_S))
        .when(F.col("status") == "removed", F.lit(0))
        .when(
            F.col("status") == "changed",
            F.greatest(
                F.lit(MIN_INTERVAL_S), F.expr("interval_s div 2")
            ),
        )
        .otherwise(
            F.least(F.lit(MAX_INTERVAL_S), F.col("interval_s") * 2)
        )
    )
    return joined.select(
        "url",
        "status",
        F.col("interval_s").alias("prev_interval_s"),
        nxt.cast("long").alias("next_interval_s"),
    )


@register(
    "crawl_revisit_schedule",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_URL_SQL} AS url, text FROM documents
    ), prev AS (
      SELECT doc_id, url, sha256(text) AS h_prev
      FROM base WHERE doc_id % 7 <> 0
    ), curr AS (
      SELECT url,
             sha256(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                         ELSE text END) AS h_curr
      FROM base WHERE doc_id % 11 <> 0
    ), d AS (
      SELECT COALESCE(prev.url, curr.url) AS url,
             CASE WHEN h_prev IS NULL THEN 'added'
                  WHEN h_curr IS NULL THEN 'removed'
                  WHEN h_prev <> h_curr THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM prev FULL OUTER JOIN curr ON prev.url = curr.url
    ), sched AS (
      SELECT url,
             CAST({MIN_INTERVAL_S} AS BIGINT)
               << (doc_id % 6) AS interval_s
      FROM prev
    )
    SELECT d.url, d.status,
           sched.interval_s AS prev_interval_s,
           CASE d.status
             WHEN 'added' THEN {DEFAULT_INTERVAL_S}
             WHEN 'removed' THEN 0
             WHEN 'changed' THEN greatest({MIN_INTERVAL_S},
                                          sched.interval_s // 2)
             ELSE least({MAX_INTERVAL_S}, sched.interval_s * 2)
           END AS next_interval_s
    FROM d LEFT JOIN sched ON d.url = sched.url
    """,
)
def crawl_revisit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive refetch intervals over the synthesized two-capture
    diff (same construction as crawl_snapshot_diff) with a standing
    schedule of intervals 1h << (doc_id % 6) for the previously-known
    urls — every doubling, halving, clamp, and default value-hashed
    against the DuckDB replay. All four policy branches carry rows at
    sf0.01."""
    docs = load(spark, sf_dir, "documents")
    base = docs.select("doc_id", synthetic_url().alias("url"), "text")
    prev = base.filter(F.col("doc_id") % 7 != 0)
    curr = base.filter(F.col("doc_id") % 11 != 0).select(
        "url",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" [rev2]")),
        ).otherwise(F.col("text")).alias("text"),
    )
    diff = snapshot_diff(prev.select("url", "text"), curr)
    schedule = prev.select(
        "url",
        F.expr(
            f"shiftleft(cast({MIN_INTERVAL_S} as bigint), "
            "cast(doc_id % 6 as int))"
        ).alias("interval_s"),
    )
    return revisit_schedule(diff, schedule)


# ---------------------------------------------------------------------------
# URL pattern census (spider-trap detection)
# ---------------------------------------------------------------------------

def url_pattern(url: Column) -> Column:
    """Structural URL shape: digit runs -> 'N', 32+-char hex runs ->
    'H' (session ids / content hashes). Calendar pages, paginated
    archives, and session-id traps collapse to ONE pattern per host,
    so a census over (host, pattern) exposes the infinite-URL-space
    subtrees a frontier must cap — the classic spider-trap signal
    (Heydon & Najork, Mercator). Regexes stay in the Java-regex ∩ RE2
    subset so DuckDB replays them."""
    p = F.regexp_replace(url, r"[0-9a-f]{32,}", "H")
    return F.regexp_replace(p, r"[0-9]+", "N")


def url_pattern_census(
    urls: DataFrame, *, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """(host, pattern, n_urls) + the host-level dominance needed for
    trap capping: per-host url count and the dominant pattern's share
    as an exact integer pair (top_pattern_n, host_urls). Two map-side-
    combinable aggregates, argmax via max(struct), no window."""
    per = urls.groupBy(host_col, url_pattern(F.col(url_col)).alias("pattern")).agg(
        F.count(F.lit(1)).alias("n_urls")
    )
    host_tot = per.groupBy(host_col).agg(
        F.sum("n_urls").alias("host_urls"),
        F.max(F.struct("n_urls", "pattern")).getField("n_urls").alias(
            "top_pattern_n"
        ),
    )
    return per.join(host_tot, host_col)


@register(
    "url_pattern_census",
    oracle=f"""
    WITH u AS (
      SELECT source || '.example' AS host,
             regexp_replace(regexp_replace(
               {_URL_SQL},
               '[0-9a-f]{{32,}}', 'H', 'g'),
               '[0-9]+', 'N', 'g') AS pattern
      FROM documents
    ),
    per AS (
      SELECT host, pattern, count(*) AS n_urls
      FROM u GROUP BY host, pattern
    ),
    tot AS (
      SELECT host, CAST(sum(n_urls) AS BIGINT) AS host_urls,
             (max(struct_pack(n_urls := n_urls, pattern := pattern))).n_urls
               AS top_pattern_n
      FROM per GROUP BY host
    )
    SELECT per.host, per.pattern, per.n_urls,
           tot.host_urls, tot.top_pattern_n
    FROM per JOIN tot USING (host)
    """,
)
def url_pattern_census_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit/hex-collapsed URL shape census per host — the synthetic
    urls (.../docN.txt) collapse to one pattern per host by
    construction, so dominance == host_urls; the pattern string, all
    counts, and the argmax are value-hashed against the DuckDB replay
    of the identical regex pipeline."""
    docs = load(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(F.col("source"), F.lit(".example")).alias("host"),
        synthetic_url().alias("url"),
    )
    out = url_pattern_census(urls)
    return out.select(
        "host", "pattern",
        F.col("n_urls").cast("long").alias("n_urls"),
        "host_urls",
        F.col("top_pattern_n").cast("long").alias("top_pattern_n"),
    )


# ---------------------------------------------------------------------------
# retry backoff
# ---------------------------------------------------------------------------

RETRY_BASE_S = 60
RETRY_CAP_S = 86_400
RETRY_MAX_ATTEMPTS = 5


def retry_backoff_plan(
    attempts: DataFrame,
    *,
    base_s: int = RETRY_BASE_S,
    cap_s: int = RETRY_CAP_S,
    max_attempts: int = RETRY_MAX_ATTEMPTS,
) -> DataFrame:
    """Exponential-backoff retry schedule over a fetch-attempt ledger
    (url, attempt_ts long epoch-sec, outcome; 'ok' = success, anything
    else a failure class). The crawl-side extension of the reference's
    requeue surface (B22 requeue/B28 retry-preview, src/db/queue.rs):
    those decide WHICH failures re-enter the queue, this decides WHEN.

    Per url: consecutive failures since the last success; urls whose
    LATEST attempt failed get next_attempt_ts = last_ts +
    min(base_s << (n_fail - 1), cap_s) — integer shift, engine-exact —
    or give_up once n_fail > max_attempts. Urls currently succeeding
    drop out (nothing to schedule).

    Shape: one window max over the ledger (per-url last success ts)
    + one grouped aggregate — the ledger is slim (url, ts, outcome)
    and partitions on url, the pipeline's natural key; no payload,
    no Python."""
    from pyspark.sql import Window

    w = Window.partitionBy("url")
    ok_ts = F.max(
        F.when(F.col("outcome") == "ok", F.col("attempt_ts"))
    ).over(w)
    marked = attempts.withColumn("_ok_ts", ok_ts)
    failed_after = (F.col("outcome") != "ok") & (
        F.col("_ok_ts").isNull() | (F.col("attempt_ts") > F.col("_ok_ts"))
    )
    agg = marked.groupBy("url").agg(
        F.sum(failed_after.cast("long")).alias("n_fail"),
        F.max("attempt_ts").alias("last_ts"),
        F.max_by("outcome", F.col("attempt_ts")).alias("last_outcome"),
    )
    eligible = agg.filter(
        (F.col("last_outcome") != "ok") & (F.col("n_fail") > 0)
    )
    # SQL shiftleft (the PySpark wrapper wants a literal bit count)
    delay = F.expr(
        f"least(shiftleft(CAST({base_s} AS BIGINT), "
        f"CAST(n_fail - 1 AS INT)), CAST({cap_s} AS BIGINT))"
    )
    return eligible.select(
        "url",
        "n_fail",
        "last_ts",
        F.when(F.col("n_fail") > max_attempts, F.lit(None).cast("long"))
        .otherwise(F.col("last_ts") + delay)
        .alias("next_attempt_ts"),
        (F.col("n_fail") > max_attempts).alias("give_up"),
    )


@register(
    "crawl_retry_backoff",
    oracle=f"""
    WITH a AS (
      SELECT 'https://h' || CAST(doc_id % 13 AS VARCHAR) || '.x/p'
               || CAST(doc_id AS VARCHAR) AS url,
             CAST(1700000000 + doc_id * 100 + t.c * 10 AS BIGINT)
               AS attempt_ts,
             CASE WHEN doc_id % 5 = 1 AND t.c = 0 THEN 'ok'
                  WHEN doc_id % 6 = 0 AND t.c = CAST(doc_id % 4 AS BIGINT)
                    THEN 'ok'
                  WHEN t.c % 3 = 0 THEN 'timeout'
                  WHEN t.c % 3 = 1 THEN 'http_5xx'
                  ELSE 'dns' END AS outcome
      FROM documents,
           UNNEST(generate_series(0, CAST(doc_id % 4 AS BIGINT))) AS t(c)
    ),
    m AS (
      SELECT url, attempt_ts, outcome,
             max(CASE WHEN outcome = 'ok' THEN attempt_ts END)
               OVER (PARTITION BY url) AS ok_ts
      FROM a
    ),
    g AS (
      SELECT url,
             CAST(sum(CASE WHEN outcome <> 'ok'
                           AND (ok_ts IS NULL OR attempt_ts > ok_ts)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
             max(attempt_ts) AS last_ts,
             arg_max(outcome, attempt_ts) AS last_outcome
      FROM m GROUP BY url
    )
    SELECT url, n_fail, last_ts,
           CASE WHEN n_fail > {RETRY_MAX_ATTEMPTS} THEN NULL
                ELSE last_ts + least(
                  CAST({RETRY_BASE_S} AS BIGINT) * (1 << (n_fail - 1)),
                  CAST({RETRY_CAP_S} AS BIGINT)) END AS next_attempt_ts,
           n_fail > {RETRY_MAX_ATTEMPTS} AS give_up
    FROM g
    WHERE last_outcome <> 'ok' AND n_fail > 0
    """,
)
def crawl_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backoff schedule over a constructed ledger: 1 + doc_id%4
    attempts per url; doc_id%5==1 urls succeed FIRST then fail (their
    failure count restarts after the success), doc_id%6==0 urls
    succeed on their LAST attempt (not scheduled), the rest cycle
    through failure classes. The oracle replays the window, the
    consecutive-failure census, the shifted delay, and the give-up
    cut."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    ledger = docs.withColumn(
        "c", F.explode(F.sequence(F.lit(0).cast("long"), d % 4))
    ).select(
        F.concat(
            F.lit("https://h"), (d % 13).cast("string"),
            F.lit(".x/p"), d.cast("string"),
        ).alias("url"),
        (F.lit(1700000000) + d * 100 + F.col("c") * 10)
        .cast("long")
        .alias("attempt_ts"),
        F.when((d % 5 == 1) & (F.col("c") == 0), F.lit("ok"))
        .when((d % 6 == 0) & (F.col("c") == (d % 4)), F.lit("ok"))
        .when(F.col("c") % 3 == 0, F.lit("timeout"))
        .when(F.col("c") % 3 == 1, F.lit("http_5xx"))
        .otherwise(F.lit("dns"))
        .alias("outcome"),
    )
    return retry_backoff_plan(ledger)
