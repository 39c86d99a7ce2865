"""Otsu threshold selection over a corpus quality histogram.

Quality gates need a cutoff; picking it by hand drifts as the corpus
mix shifts.  Otsu's method (Otsu 1979 — the standard automatic
threshold from image binarization) picks the cut that maximizes
between-class variance over a histogram — here the corpus document-
quality histogram, so the filter threshold adapts to each crawl
snapshot deterministically.

Exact-integer formulation (house style — no floats, both engines
agree bit-for-bit): with per-bucket counts c_b over B buckets,
N = Σc, S = Σ b·c_b, and prefix sums w0(t), s0(t):

    σ²_between(t) ∝ (s0·N − S·w0)² / (w0·(N − w0))

maximized over t with the scaled-integer value
`num² div den` (truncating div replayed identically in SQL).
int64 bound: |s0·N − S·w0| ≤ B²·N² → N ≤ ~3·10⁶ at B=64 before
overflow; at 10^12 docs the same two prefix frames run in
decimal(38,0)/HUGEINT — the histogram itself is only B rows either
way (counts are map-side-combined; NOTHING corpus-sized reaches the
window).

The bucket statistic here is document length in 10-char buckets
capped at B-1 — the cheap universal quality proxy; any integer
bucket column (LM surprisal bucket, NB logit bucket) drops in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

N_BUCKETS = 64
BUCKET_CHARS = 10  # bucket = min(len div 10, 63)


def otsu_threshold(
    df: DataFrame, bucket_col: F.Column, *, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """One row (threshold, var_scaled, n_docs, w0) — the Otsu argmax
    over the histogram of `bucket_col` (ints in [0, n_buckets))."""
    hist = (
        df.select(bucket_col.cast("long").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pref = hist.select(
        "b",
        F.sum("c").over(w).alias("w0"),
        F.sum(F.col("b") * F.col("c")).over(w).alias("s0"),
    )
    tot = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("b") * F.col("c")).cast("long").alias("s"),
    )
    scored = pref.crossJoin(F.broadcast(tot)).filter(
        (F.col("w0") > 0) & (F.col("w0") < F.col("n"))
    )
    scored = scored.select(
        F.col("b").alias("threshold"),
        F.expr(
            "((s0 * n - s * w0) * (s0 * n - s * w0)) div (w0 * (n - w0))"
        ).alias("var_scaled"),
        F.col("n").alias("n_docs"),
        F.col("w0"),
    )
    return (
        scored.orderBy(F.desc("var_scaled"), F.asc("threshold"))
        .limit(1)
    )


_ORACLE = f"""
WITH hist AS (
  SELECT least(length(text) // {BUCKET_CHARS}, {N_BUCKETS - 1}) AS b,
         count(*) AS c
  FROM documents GROUP BY 1
), pref AS (
  SELECT b,
         sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS w0,
         sum(b * c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS s0
  FROM hist
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(b * c) AS BIGINT) AS s
  FROM hist
), scored AS (
  SELECT b AS threshold,
         CAST(((s0 * n - s * w0) * (s0 * n - s * w0))
              // (w0 * (n - w0)) AS BIGINT) AS var_scaled,
         n AS n_docs,
         CAST(w0 AS BIGINT) AS w0
  FROM pref CROSS JOIN tot
  WHERE w0 > 0 AND w0 < n
)
SELECT threshold, var_scaled, n_docs, w0
FROM scored ORDER BY var_scaled DESC, threshold ASC LIMIT 1
"""


@register("quality_threshold_otsu", oracle=_ORACLE)
def quality_threshold_otsu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Otsu cut over the doc-length histogram, value-hashed: DuckDB
    replays the histogram, both prefix sums, the scaled-integer
    between-class variance, and the argmax tie-break."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(F.length("text") / BUCKET_CHARS), F.lit(N_BUCKETS - 1)
    )
    return otsu_threshold(docs, bucket)
