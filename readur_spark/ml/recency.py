"""Recency-decay sample weighting (crawl-freshness tier).

Training-data pipelines over rolling web crawls weight RECENT captures
higher: fresher pages carry updated facts and less link-rot, and
snapshot-stacked corpora otherwise oversample content that has existed
(and been re-crawled) longest. The standard recipe is exponential
time decay — weight halves every half-life — fed into a
probability-proportional-to-size sampler. The reference engine's
nearest analogue is its recency sort on search results
(ORDER BY created_at paths in src/db/); this is the corpus-sampling
form of the same signal.

Integer-exact decay (the repo's no-libm convention): ages bucket at
half-life granularity and the weight is a pure bit shift,

    bucket   = age_seconds div HALF_LIFE_SEC          (0 = newest)
    weight   = 1 << (W_MAX - least(bucket, W_MAX))    (2^16 .. 1)

so the whole weight column replays bit-for-bit in DuckDB, and the
sample itself reuses ml/webfilters.py's content-addressed bottom-k
priority sampler (priority = hash64(key) div weight) — the winning
set is identical under any partitioning or engine.

Scale design: the anchor (corpus max timestamp) is ONE scalar from a
map-side-combinable agg, broadcast back via a 1-row cross join (the
repo's scalar-broadcast shape); weighting is a pure projection; the
sample is one TakeOrderedAndProject — per-partition bottom-k heaps,
no global sort, no window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.webfilters import weighted_priority_sample
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

HALF_LIFE_SEC = 172_800  # 2 days
W_MAX = 16  # newest bucket weighs 2^16; floor weight is 1


def with_recency_weight(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    out_col: str = "recency_w",
    half_life_sec: int = HALF_LIFE_SEC,
    w_max: int = W_MAX,
) -> DataFrame:
    """Adds the integer decay weight. The anchor is the corpus max of
    `ts_col` (deterministic; re-runs over the same snapshot reproduce).
    Age is the MICROSECOND difference divided down to seconds — pure
    calendar arithmetic on both engines (no epoch anchoring, no
    timezone interpretation of the NTZ values), and truncating div on
    non-negative ages equals flooring // cross-engine."""
    anchor = df.agg(F.max(ts_col).alias("_anchor"))
    d = df.crossJoin(F.broadcast(anchor))
    bucket = (
        f"least(timestampdiff(MICROSECOND, {ts_col}, _anchor)"
        f" div 1000000 div {half_life_sec}, {w_max})"
    )
    return d.withColumn(
        out_col, F.expr(f"shiftleft(cast(1 as bigint), {w_max} - ({bucket}))")
    ).drop("_anchor")


def recency_sample(
    df: DataFrame,
    k: int,
    *,
    ts_col: str = "ts",
    key_col: str = "event_id",
) -> DataFrame:
    """Deterministic PPS sample of k rows, mass proportional to the
    recency decay weight."""
    weighted = with_recency_weight(df, ts_col=ts_col)
    keyed = weighted.withColumn("_key", F.col(key_col).cast("string"))
    return weighted_priority_sample(keyed, "recency_w", "_key", k).drop(
        "_key"
    )


# ---- driver-contract query ------------------------------------------------

SAMPLE_K = 100


@register(
    "sample_recency_decay",
    oracle=f"""
    WITH a AS (
      SELECT epoch_us(max(ts)) AS anchor_us FROM events
    ),
    w AS (
      SELECT event_id,
             CAST(1 AS BIGINT) << ({W_MAX} - least(
               (a.anchor_us - epoch_us(ts)) // 1000000
                 // {HALF_LIFE_SEC}, {W_MAX})) AS recency_w
      FROM events, a
    ),
    p AS (
      SELECT event_id, recency_w,
             CAST(concat('0x',
               substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
               // recency_w AS priority,
             md5(CAST(event_id AS VARCHAR)) AS h
      FROM w
    )
    SELECT event_id, recency_w, priority
    FROM p ORDER BY priority, h LIMIT {SAMPLE_K}
    """,
)
def sample_recency_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-recency-weighted PPS sample of the events table —
    anchor scalar, every bit-shift weight, every integer priority, and
    the exact winning set value-hashed against the DuckDB replay."""
    events = load(spark, sf_dir, "events")
    return recency_sample(events, SAMPLE_K).select(
        "event_id",
        F.col("recency_w").cast("long").alias("recency_w"),
        "priority",
    )
