"""Operational queries: boolean search, consistency audits, bulk-retry
planning, skew-salted host aggregation (SURVEY.md §2 B4, B25, B27-B28;
partitioning §4).

All stock Catalyst plans — predicates/joins/aggregations; the salted
aggregation is the explicit two-phase pattern the north rule requires
for Zipf-skewed hosts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.search import tokens
from readur_spark.queries.tables import load


# ---- B4 boolean mode -------------------------------------------------------


def term(text_col: Column, t: str) -> Column:
    return F.array_contains(tokens(text_col), t)


@register(
    "search_boolean",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE (list_contains(string_split(text, ' '), 'spark')
           AND list_contains(string_split(text, ' '), 'join'))
       OR (list_contains(string_split(text, ' '), 'vector')
           AND NOT list_contains(string_split(text, ' '), 'stream'))
    """,
)
def search_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_tsquery boolean mode (src/db/documents/search.rs:115-121):
    the query's AND/OR/NOT tree compiled to a Catalyst boolean
    expression — ('spark' & 'join') | ('vector' & !'stream')."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    cond = (term(t, "spark") & term(t, "join")) | (
        term(t, "vector") & ~term(t, "stream")
    )
    return docs.filter(cond).select("doc_id", "lang")


# ---- B25 consistency audits ------------------------------------------------


@register(
    "consistency_orphan_events",
    oracle="""
    SELECT e.user_id, count(*) AS n_events
    FROM events e
    WHERE e.user_id NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal >= 0)
    GROUP BY e.user_id
    """,
)
def consistency_orphan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphaned-row audit (src/db_guardrails_simple.rs:180-212: LEFT
    JOIN ... WHERE d.id IS NULL) as a left-anti join + rollup. The
    registry side is the *active* customer set (c_acctbal >= 0 — the
    deactivated-user analog), so the audit actually finds orphans on
    the test corpus (2/14 orphan users at sf0.001/0.01) instead of
    green-lighting any implementation with an empty result. The
    dimension side is broadcast."""
    events = load(spark, sf_dir, "events")
    active = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") >= 0)
        .select(F.col("c_custkey").alias("user_id"))
    )
    return (
        events.join(F.broadcast(active), "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )


@register(
    "consistency_stale_inflight",
    oracle="""
    SELECT count(*) AS n_stale
    FROM events
    WHERE event_type = 'login'
      AND ts < (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    """,
)
def consistency_stale_inflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stale-item sweep shape (src/ocr/queue.rs:1101-1121: processing
    older than N minutes): a threshold relative to the corpus'
    high-water mark, not wall clock — deterministic and cluster-safe."""
    events = load(spark, sf_dir, "events")
    hwm = events.agg(F.max("ts").alias("m"))
    return (
        events.crossJoin(F.broadcast(hwm))
        .filter(
            (F.col("event_type") == "login")
            & (F.col("ts") < F.col("m") - F.expr("INTERVAL 7 DAY"))
        )
        .agg(F.count("*").alias("n_stale"))
    )


# ---- B27/B28 bulk operations ----------------------------------------------


@register(
    "bulk_retry_preview",
    oracle="""
    SELECT event_type AS reason,
           count(*) AS n_matched,
           CAST(least(greatest(avg(value) / 10, 1), 20) AS INT) AS priority_override
    FROM events
    WHERE event_type IN ('error', 'logout') AND value < 150
    GROUP BY event_type
    """,
)
def bulk_retry_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28 preview mode (src/routes/documents_ocr_retry.rs:24-200):
    filter-mode selection + per-reason counts + clamped 1-20 priority
    override, without mutating anything."""
    events = load(spark, sf_dir, "events")
    sel = events.filter(
        F.col("event_type").isin("error", "logout") & (F.col("value") < 150)
    )
    prio = F.least(F.greatest(F.avg("value") / 10, F.lit(1)), F.lit(20))
    return sel.groupBy(F.col("event_type").alias("reason")).agg(
        F.count("*").alias("n_matched"),
        prio.cast("int").alias("priority_override"),
    )


@register(
    "bulk_delete_accounting",
    oracle="""
    SELECT
      count(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS n_deleted,
      count(CASE WHEN doc_id % 7 <> 0 THEN 1 END) AS n_kept,
      CAST(sum(CASE WHEN doc_id % 7 = 0 THEN n_chars ELSE 0 END) AS BIGINT) AS bytes_freed
    FROM documents
    """,
)
def bulk_delete_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 bulk delete (src/db/documents/operations.rs:22-54) as
    set-at-a-time accounting: the per-id DELETE RETURNING loop becomes
    one conditional aggregation over the target set."""
    docs = load(spark, sf_dir, "documents")
    is_target = F.col("doc_id") % 7 == 0
    return docs.agg(
        F.count(F.when(is_target, 1)).alias("n_deleted"),
        F.count(F.when(~is_target, 1)).alias("n_kept"),
        F.sum(F.when(is_target, F.col("n_chars")).otherwise(0)).alias("bytes_freed"),
    )


# ---- streaming twins run as batch (oracle-checkable) -----------------------


@register(
    "windowed_event_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def windowed_event_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming windowed rollup (streaming/windows.py) evaluated
    in batch — one expression serves both engines, so the DuckDB
    oracle transitively checks the streaming aggregation logic."""
    from readur_spark.streaming.windows import windowed_event_counts

    return windowed_event_counts(load(spark, sf_dir, "events"))


@register(
    "sessionize_events",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS INT) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def sessionize_events_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, batch twin of the stateful streaming
    operator (streaming/windows.py sessionize)."""
    from readur_spark.streaming.windows import sessionize_batch

    return sessionize_batch(load(spark, sf_dir, "events"), gap_seconds=1800)


@register(
    "stream_dedup_events",
    oracle="""
    SELECT user_id, event_type,
           min(event_id) AS first_event_id,
           count(*) - 1 AS n_suppressed
    FROM events
    GROUP BY user_id, event_type
    """,
)
def stream_dedup_events_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic twin of the watermarked stream dedup
    (streaming/windows.py dedup_events_stream): first event per
    (user_id, event_type) plus how many re-deliveries the stream path
    would suppress."""
    from readur_spark.streaming.windows import first_event_per_key

    return first_event_per_key(
        load(spark, sf_dir, "events"), ["user_id", "event_type"]
    )


# ---- skew-salted host aggregation (north rule) -----------------------------


@register(
    "host_counts_salted",
    oracle="""
    SELECT source || '.example' AS host, count(*) AS n_pages
    FROM documents
    GROUP BY source || '.example'
    """,
)
def host_counts_salted_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host counts through the explicit two-phase salted aggregate
    (operators.partitioning.host_counts_salted): heavy hosts fan out
    to salted subkeys, partials merge per host. Result is identical to
    a plain GROUP BY — the oracle proves it."""
    from readur_spark.corpus import pages_from_documents
    from readur_spark.operators.partitioning import host_counts_salted

    pages = pages_from_documents(spark, sf_dir)
    return host_counts_salted(pages, n_salts=8, threshold=0.05)


@register(
    "ignored_files_gate",
    oracle="""
    WITH ignored AS (
      SELECT sha256(text) AS h FROM documents WHERE doc_id % 13 = 0
    )
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE sha256(d.text) NOT IN (SELECT h FROM ignored)
    """,
)
def ignored_files_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ignored-files anti-join over a deterministic ignore list
    (every 13th doc's content hash) — survivors are per-row
    hash-checked. Exercises the hash-only matching shape of
    db/ignored_files.rs:357."""
    from readur_spark.operators.dedup import filter_ignored

    docs = load(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", "source", F.col("text").alias("_content"),
        F.sha2(F.col("text"), 256).alias("sha256"),
    )
    ignored = pages.filter(F.col("doc_id") % 13 == 0).select("sha256")
    # pages already carry sha256 → filter_ignored's with_sha256 is a
    # no-op on them
    survivors = pages.join(
        F.broadcast(ignored.distinct()), "sha256", "left_anti"
    )
    return survivors.select("doc_id", "source")
