"""Analytics rollups, joins, anti-joins, system metrics
(SURVEY.md §2 B16, B18, B20, B22, B25, B29, B30).

Join-strategy notes (SURVEY.md §4): dimension tables (region, nation,
supplier at these scales) are broadcast — `F.broadcast` forces the
plan Catalyst would pick with fresh stats, and at 100 TB the dims stay
broadcastable while facts shuffle only when an agg key demands it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


@register(
    "daily_analytics_rollup",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           count(*) AS n_events,
           round(avg(value), 2) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(CASE WHEN value < 50 THEN 1 END) AS n_low,
           count(CASE WHEN value >= 80 THEN 1 END) AS n_high,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_failed
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def daily_analytics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 — the ocr_analytics daily view
    (migrations/20250620100005_create_ocr_analytics_view.sql:1-19):
    GROUP BY day with avg/min/max + FILTER-style conditional counts."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 2).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.when(F.col("value") < 50, 1)).alias("n_low"),
        F.count(F.when(F.col("value") >= 80, 1)).alias("n_high"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_failed"),
    )


@register(
    "label_join_counts",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_suppliers,
           round(sum(s.s_acctbal), 2) AS total_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def label_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 label-join shape (src/db/documents/management.rs:12-84):
    fact ⋈ broadcast(dims) → grouped counts. nation/region are the
    labels; broadcast keeps the join shuffle-free."""
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_acctbal"),
        )
    )


@register(
    "low_confidence_finder",
    oracle="""
    SELECT event_id, event_type, value,
           CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS sort_key
    FROM events
    WHERE value <= 30
    """,
)
def low_confidence_finder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 low-confidence/failed finder
    (src/db/documents/operations.rs:57-108): threshold filter + the
    failed-first CASE sort key."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("value") <= 30).select(
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "error", 0).otherwise(1).alias("sort_key"),
    )


@register(
    "requeue_antijoin",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def requeue_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22/B25 anti-join shape (src/ocr/queue.rs:978-1082 requeue;
    db_guardrails_simple.rs:180-212 orphan check): items with no
    *qualifying* counterpart — left_anti against a filtered right side
    (the requeue predicate 'no successful attempt'). Parameterized so
    the result is non-empty on the test corpus: customers with no
    urgent order (18/203 rows at sf0.001/0.01), not the vacuous
    'customers with no order at all' (always zero on TPC-H-shaped
    data)."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return customer.join(urgent, "c_custkey", "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "system_metrics",
    oracle="""
    SELECT count(*) AS n_lineitems,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_suppkey) AS n_active_suppliers,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 3) AS avg_qty
    FROM lineitem
    """,
)
def system_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29 system-metrics multi-agg (src/routes/metrics.rs:121-268):
    one pass, several aggregates incl. COUNT(DISTINCT …)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_lineitems"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_active_suppliers"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.round(F.avg("l_quantity"), 3).alias("avg_qty"),
    )


@register(
    "queue_stats",
    oracle="""
    SELECT o_orderstatus AS status,
           count(*) AS n,
           round(avg(o_totalprice), 2) AS avg_price,
           min(o_orderdate) AS oldest,
           max(o_orderdate) AS newest
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def queue_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 queue statistics shape (src/ocr/queue.rs:804-975): per-status
    counts, averages, oldest/newest."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        F.min("o_orderdate").alias("oldest"),
        F.max("o_orderdate").alias("newest"),
    )


@register(
    "rbac_filter",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    WHERE user_id = 13
    GROUP BY user_id
    """,
)
def rbac_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 role filter (src/db/documents/helpers.rs:55-69): non-admin
    sees only their rows."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") == 13)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---- multi-dimensional rollups and distribution analytics ------------------


@register(
    "corpus_cube_rollup",
    oracle="""
    SELECT coalesce(lang, '(all)') AS lang_g,
           coalesce(source, '(all)') AS source_g,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
)
def corpus_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations in one pass (the dashboard
    "slice by anything" rollup readur's analytics views approximate
    with separate queries — migrations/20250620100001 ocr_analytics).
    Spark expands the cube map-side into one shuffle; at 10^12 rows
    each grouping set is still a partial-aggregatable hash agg, so the
    cost is ~#grouping-sets × the plain rollup, not extra scans."""
    docs = load(spark, sf_dir, "documents")
    cube = docs.cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    # the grouping-set NULL marker becomes an explicit '(all)' so the
    # result is null-free (and the driver comparator can sort rows)
    return cube.select(
        F.coalesce("lang", F.lit("(all)")).alias("lang_g"),
        F.coalesce("source", F.lit("(all)")).alias("source_g"),
        "n_docs", "total_chars",
    )


@register(
    "qc_length_percentiles",
    oracle="""
    SELECT doc_id, lang,
           round(percent_rank() OVER
             (PARTITION BY lang ORDER BY n_chars, doc_id), 6) AS len_pctile
    FROM documents
    """,
)
def qc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang document-length percentile (the curation signal behind
    "drop the shortest X% per language"). percent_rank is
    (rank-1)/(n-1) — exact rational arithmetic, so the doubles hash
    identically; doc_id breaks ties deterministically. Per-stratum
    window sort, same scale shape as stratified_sample."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id", "lang",
        F.round(F.percent_rank().over(w), 6).alias("len_pctile"),
    )


@register(
    "length_histogram_quantiles",
    oracle="""
    WITH h AS (
      SELECT lang, n_chars, count(*) AS k
      FROM documents GROUP BY lang, n_chars
    ),
    c AS (
      SELECT lang, n_chars, k,
             CAST(sum(k) OVER (PARTITION BY lang ORDER BY n_chars)
               AS BIGINT) AS cum,
             CAST(sum(k) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM h
    )
    SELECT lang, any_value(n) AS n_docs,
           min(CASE WHEN 100 * cum >= 50 * n THEN n_chars END) AS p50,
           min(CASE WHEN 100 * cum >= 90 * n THEN n_chars END) AS p90,
           min(CASE WHEN 100 * cum >= 99 * n THEN n_chars END) AS p99
    FROM c GROUP BY lang
    """,
)
def length_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-language length quantiles with no row sort: the
    corpus reduces to a (lang, value) histogram first (map-side
    combinable — the only shuffle carries distinct values, not rows),
    then a cumulative window over the slim histogram reads off
    type-1 quantiles (smallest v with cum(v) >= ceil(q*n)). The
    scale-correct alternative to both percent_rank (per-row window
    sort, `qc_length_percentiles`) and approx_percentile (error
    bars): for any bounded integer metric, exact quantiles at 10^12
    rows cost one histogram aggregation. Integer arithmetic
    throughout — value-hash exact in DuckDB."""
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy("lang", "n_chars").agg(F.count("*").alias("k"))
    wcum = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("lang")
    c = hist.select(
        "lang",
        "n_chars",
        F.sum("k").over(wcum).cast("long").alias("cum"),
        F.sum("k").over(wall).cast("long").alias("n"),
    )
    q = lambda p: F.min(  # noqa: E731
        F.when(100 * F.col("cum") >= p * F.col("n"), F.col("n_chars"))
    )
    return c.groupBy("lang").agg(
        F.any_value(F.col("n")).alias("n_docs"),
        q(50).alias("p50"),
        q(90).alias("p90"),
        q(99).alias("p99"),
    )


def quantiles_hash_sampled(
    docs: DataFrame,
    *,
    value_col: str,
    key_col: str,
    group_col: str = "lang",
    rate_permille: int = 125,
) -> DataFrame:
    """Per-group quantiles over a DETERMINISTIC hash sample: keep rows
    whose md5(key) bucket (first 8 hex chars mod 1000) falls under
    `rate_permille`, then run the same exact histogram-cum-window
    quantile readout as `length_histogram_quantiles` on the sample.

    This is the UNBOUNDED-cardinality / streaming complement of the
    exact-histogram twin: when the metric's distinct-value set is too
    large for the histogram shuffle (real-valued scores, byte sizes at
    10^12 rows), a 1/8 deterministic sample caps the histogram at
    sample size while staying reproducible (same keys -> same sample
    on any engine, any run) and MERGEABLE (the union of two shards'
    samples IS the sample of the union — same per-key predicate,
    unlike reservoir sampling which needs coordinated state)."""
    from pyspark.sql.window import Window

    bucket = (
        F.conv(
            F.substring(
                F.md5(F.encode(F.col(key_col).cast("string"), "UTF-8")),
                1, 8,
            ),
            16, 10,
        ).cast("long") % 1000
    )
    sample = docs.filter(bucket < rate_permille)
    hist = sample.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("k")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(group_col)
    c = hist.withColumn("cum", F.sum("k").over(wcum)).withColumn(
        "n", F.sum("k").over(wall)
    )
    v = F.col(value_col)
    return c.groupBy(group_col).agg(
        F.any_value(F.col("n")).alias("n_sampled"),
        F.min(F.when(100 * F.col("cum") >= 50 * F.col("n"), v)).alias("p50"),
        F.min(F.when(100 * F.col("cum") >= 90 * F.col("n"), v)).alias("p90"),
        F.min(F.when(100 * F.col("cum") >= 99 * F.col("n"), v)).alias("p99"),
    )


@register(
    "length_quantiles_sampled",
    oracle="""
    WITH s AS (
      SELECT lang, n_chars
      FROM documents
      WHERE CAST(concat('0x',
              substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            % 1000 < 125
    ),
    h AS (
      SELECT lang, n_chars, count(*) AS k FROM s GROUP BY lang, n_chars
    ),
    c AS (
      SELECT lang, n_chars, k,
             CAST(sum(k) OVER (PARTITION BY lang ORDER BY n_chars)
               AS BIGINT) AS cum,
             CAST(sum(k) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM h
    )
    SELECT lang, any_value(n) AS n_sampled,
           min(CASE WHEN 100 * cum >= 50 * n THEN n_chars END) AS p50,
           min(CASE WHEN 100 * cum >= 90 * n THEN n_chars END) AS p90,
           min(CASE WHEN 100 * cum >= 99 * n THEN n_chars END) AS p99
    FROM c GROUP BY lang
    """,
)
def length_quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`length_histogram_quantiles`'s hash-sampled twin at 125 permille
    — the sample membership (md5 bucket), the histogram, and the
    cumulative readout all value-hashed."""
    docs = load(spark, sf_dir, "documents")
    return quantiles_hash_sampled(
        docs, value_col="n_chars", key_col="doc_id"
    )
