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


# ---- split-conformal threshold (r5s11) -------------------------------------

CONF_ALPHA_PCT = 10  # target miscoverage: keep ≥90% of good docs


def conformal_threshold(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """One row (n_cal, q_rank, threshold_score, kept_good_permille) —
    the split-conformal acceptance threshold (Vovk et al.; the
    distribution-free coverage recipe): over the CALIBRATION set of
    known-good documents (label = 1), take nonconformity = −score and
    choose the ⌈(n+1)·(1−α)⌉-th smallest nonconformity. Gating new
    documents at score ≥ threshold_score then keeps ≥ 1−α of good
    documents (finite-sample guarantee, no distributional assumption).

    Exact integers: the quantile is an ORDER-STATISTIC (rank
    ⌈(n+1)·90/100⌉ via integer arithmetic), not an interpolated
    percentile — both engines pick the identical calibration row
    (ties broken by score then implicit row identity collapses:
    rank selection is on the sorted multiset, so equal scores give
    equal thresholds).

    Scale: one filter + one global sort of the slim (score) frame to
    a single rank probe — at 10^12 scale the same order statistic
    comes off the existing histogram/quantile tier; the conformal
    arithmetic is unchanged."""
    cal = scored.filter(F.col(label_col) == 1).select(
        F.col(score_col).alias("s")
    )
    n = cal.count()
    q_rank = min(n, -(-(n + 1) * (100 - CONF_ALPHA_PCT) // 100))
    w = Window.orderBy(F.asc("nc"))
    ranked = cal.select((-F.col("s")).alias("nc")).withColumn(
        "rk", F.row_number().over(w)
    )
    chosen = ranked.filter(F.col("rk") == q_rank)
    kept = cal.join(
        chosen.select(F.col("nc").alias("_t")), F.lit(True), "cross"
    ).agg(
        F.sum(F.when(-F.col("s") <= F.col("_t"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept")
    )
    return (
        chosen.crossJoin(F.broadcast(kept))
        .select(
            F.lit(n).cast("long").alias("n_cal"),
            F.lit(q_rank).cast("long").alias("q_rank"),
            (-F.col("nc")).alias("threshold_score"),
            F.expr(f"(1000L * n_kept) div {max(n, 1)}L").alias(
                "kept_good_permille"
            ),
        )
    )


@register(
    "conformal_quality_threshold",
    oracle=f"""
    WITH cal AS (
      SELECT -CAST(least(length(text) // {BUCKET_CHARS},
                         {N_BUCKETS - 1}) AS BIGINT) AS nc,
             CAST(least(length(text) // {BUCKET_CHARS},
                        {N_BUCKETS - 1}) AS BIGINT) AS s
      FROM documents WHERE lang = 'en'
    ), n AS (SELECT count(*) AS n_cal FROM cal),
    ranked AS (
      SELECT nc, row_number() OVER (ORDER BY nc ASC) AS rk FROM cal
    ), chosen AS (
      SELECT nc FROM ranked, n
      WHERE rk = least(n_cal, ((n_cal + 1) * 90 + 99) // 100)
    )
    SELECT n.n_cal,
           least(n.n_cal, ((n.n_cal + 1) * 90 + 99) // 100)
             AS q_rank,
           -c.nc AS threshold_score,
           CAST((1000 * (SELECT count(*) FROM cal WHERE nc <= c.nc))
                // n.n_cal AS BIGINT) AS kept_good_permille
    FROM chosen c, n
    """,
)
def conformal_quality_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal acceptance threshold over the English slice
    (calibration = label 1), scored by the length-bucket statistic the
    Otsu tier uses — the order-statistic rank, the chosen threshold,
    and the empirical coverage all value-hashed. ⌈(n+1)·0.9⌉ is
    integer ceil-division in BOTH engines (((n+1)·90 + 99) div 100) —
    no float ceil, whose representation error flips exact multiples."""
    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        F.least(
            F.floor(F.length("text") / BUCKET_CHARS),
            F.lit(N_BUCKETS - 1),
        ).cast("long").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
    )
    return conformal_threshold(scored)
