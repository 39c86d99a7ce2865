"""Partitioning & skew handling (north_rule: url-hash partitioning
with explicit salting of skewed hosts).

Why it matters: a Common-Crawl corpus is Zipf-skewed by host — a few
hosts contribute orders of magnitude more pages (and bytes) than the
median. Operations keyed by host (host-level aggregations, politeness
grouping, per-site dedup) would put one host's 10^9 pages in one task.
Two mechanisms, both explicit:

  1. `repartition_by_url_hash` — the extraction stage is keyed by
     xxhash64(url): uniform by construction, so partitions are
     row-balanced regardless of host skew. Byte-skew (one partition
     catching several 100 MB documents) is bounded by the A9 priority
     bucket used as a range prefix — big docs spread across partitions
     instead of clustering.
  2. `salted_host_key` — for host-keyed aggregations: heavy hosts
     (estimated with a cheap sampled count, or supplied) get their key
     split into `n_salts` subkeys; aggregate partially per subkey, then
     merge. AQE's skewJoin handles join-side skew at runtime; salting
     handles aggregation skew AQE cannot split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_url_hash(df: DataFrame) -> DataFrame:
    return df.withColumn("url_hash", F.xxhash64("url"))


def with_host(df: DataFrame) -> DataFrame:
    # parse_url is expensive regex; a split chain is codegen-friendly
    return df.withColumn(
        "host",
        F.element_at(F.split(F.regexp_replace("url", r"^[a-z]+://", ""), "/"), 1),
    )


def repartition_by_url_hash(df: DataFrame, num_partitions: int) -> DataFrame:
    """Uniform row-balanced partitions; priority prefix spreads large
    documents (A9 buckets — src/ingestion/batch_ingest.rs:281-294 used
    as a scheduling key, replacing the reference's priority queue)."""
    df = with_url_hash(df)
    if "priority" in df.columns:
        return df.repartitionByRange(num_partitions, "priority", "url_hash")
    return df.repartition(num_partitions, "url_hash")


def heavy_hosts(df: DataFrame, threshold_fraction: float = 0.01) -> DataFrame:
    """Hosts holding > threshold_fraction of all rows (the salting
    set). One pass, partial-aggregatable: the total comes from a window
    sum over the per-host counts, not a second scan of `df`."""
    hosts = with_host(df).groupBy("host").count()
    total = F.sum("count").over(Window.partitionBy())
    return (
        hosts.withColumn("_total", total)
        .filter(F.col("count") > F.col("_total") * threshold_fraction)
        .select("host")
    )


def salted_host_key(
    df: DataFrame, heavy: DataFrame, n_salts: int = 16
) -> DataFrame:
    """Adds `host_salted`: heavy hosts fan out to `host#k`
    (k = xxhash64(url) % n_salts, deterministic), others keep `host`.
    Aggregations run on host_salted first (partial), then re-aggregate
    on host — the classic two-phase salted agg."""
    df = with_host(df)
    heavy = heavy.withColumnRenamed("host", "host").withColumn(
        "_is_heavy", F.lit(True)
    )
    joined = df.join(F.broadcast(heavy), "host", "left")
    salt = F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int")
    return joined.withColumn(
        "host_salted",
        F.when(
            F.col("_is_heavy").isNotNull(),
            F.concat_ws("#", F.col("host"), salt.cast("string")),
        ).otherwise(F.col("host")),
    ).drop("_is_heavy")


def host_counts_salted(df: DataFrame, n_salts: int = 16, threshold: float = 0.01) -> DataFrame:
    """Reference pattern: per-host page counts that survive Zipf skew —
    two-phase aggregate over the salted key."""
    heavy = heavy_hosts(df, threshold)
    salted = salted_host_key(df, heavy, n_salts)
    partial = salted.groupBy("host", "host_salted").count()
    return partial.groupBy("host").agg(F.sum("count").alias("n_pages"))


def topk_per_group_salted(
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list,
    k: int,
    *,
    salt_expr=None,
    n_salts: int = 16,
) -> DataFrame:
    """Exact top-k rows per group via SALTED two-phase election — the
    mega-group-safe form of `row_number().over(partitionBy(group))`.

    A single window puts each group's entire row set in one task: fine
    for median hosts, fatal for a 10^8-page domain. Standard fix (the
    per-partition-heap shape of TakeOrdered, expressed relationally):

      phase 1: window over (group, salt) — each salted subgroup holds
        ~1/n_salts of the group; keep its local top-k. Correct because
        every global top-k row is top-k within its own subgroup.
      phase 2: window over (group) on the ≤ n_salts·k survivors —
        now bounded rows per group regardless of group size.

    Returns df rows + `rank` (the phase-2 global rank), filtered to
    rank ≤ k — IDENTICAL output to the single-window form (pinned in
    tests), with the mega-partition split by construction.

    `order_exprs` must be a deterministic total order (include a
    tie-break column). `salt_expr` defaults to a uniform hash of the
    full row order key is NOT available here — pass something content-
    addressed (e.g. doc_id % n_salts) so re-runs elect identically.
    """
    salt = (
        salt_expr
        if salt_expr is not None
        else F.abs(F.xxhash64(*[F.col(c) for c in group_cols])) % n_salts
    )
    w1 = Window.partitionBy(
        *[F.col(c) for c in group_cols], F.col("_salt")
    ).orderBy(*order_exprs)
    w2 = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        *order_exprs
    )
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(w1))
        .filter(F.col("_lr") <= k)
        .drop("_lr")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .drop("_salt")
    )
