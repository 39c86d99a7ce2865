"""word2vec-style negative-sampling table (unigram^(3/4)).

The published recipe (Mikolov et al. 2013): negative examples for
contrastive word/embedding training are drawn from the unigram
distribution raised to the 3/4 power — flattening the head so
frequent tokens don't dominate, without drowning in the tail.  The
data-side artifact is the SAMPLING TABLE: top-V tokens with their
smoothed weights and an integer ppm allocation that downstream
samplers consume.

Exact-integer formulation (no pow, no libm): for a count c,

    c^(3/4) = floor(sqrt(floor(sqrt(c³))))

— nested integer square roots (floor∘sqrt∘floor∘sqrt = floor of the
4th root for integers), each computed with the repo's ±1-ulp-
corrected isqrt.  c³ fits int64 up to c ≈ 2.09M; past that the same
two isqrt passes run in decimal(38,0)/HUGEINT (the frame is V rows
either way).  The ppm allocation is the Hamilton largest-remainder
scheme over the weight total — quotas sum to exactly 1e6.

Scale: ONE grouped token count (map-side combinable), a top-V
TakeOrdered (V constant), and a V-row window pass. No payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.ml.mixing import isqrt_col
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

NEG_VOCAB = 200       # sampling-table size
PPM_TOTAL = 1_000_000


def pow34(c: Column) -> Column:
    """floor(c^(3/4)) exactly for non-negative longs (c³ in int64)."""
    return isqrt_col(isqrt_col(c * c * c))


def negative_sampling_table(
    df: DataFrame, *, text_col: str = "text", top_v: int = NEG_VOCAB
) -> DataFrame:
    """(tok, c, w34, ppm) — top-V tokens by count (ties broken on the
    token), unigram^(3/4) weights, Hamilton ppm quotas summing to
    exactly PPM_TOTAL."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.orderBy(F.desc("c"), F.asc("tok"))
    top = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_v)
        .withColumn("w34", pow34(F.col("c")))
    )
    tot = top.agg(F.sum("w34").cast("long").alias("tw"))
    quota = top.crossJoin(F.broadcast(tot)).select(
        "tok",
        "c",
        "w34",
        F.expr(f"({PPM_TOTAL}L * w34) div tw").alias("fl"),
        F.expr(f"({PPM_TOTAL}L * w34) % tw").alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(PPM_TOTAL) - F.sum("fl")).cast("long").alias("k")
    )
    rw = Window.orderBy(F.desc("rem"), F.asc("tok"))
    return (
        quota.withColumn("rrk", F.row_number().over(rw))
        .crossJoin(F.broadcast(leftover))
        .select(
            "tok",
            "c",
            "w34",
            F.expr("fl + if(rrk <= k, 1L, 0L)").alias("ppm"),
        )
    )


_ORACLE = f"""
WITH counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
        FROM documents)
  WHERE tok <> ''
  GROUP BY tok
), top AS (
  SELECT tok, c,
         row_number() OVER (ORDER BY c DESC, tok ASC) AS rk
  FROM counts
), isq AS (
  SELECT tok, c,
         -- exact isqrt(c^3) with the ±1 correction
         CASE WHEN (s0 + 1) * (s0 + 1) <= c * c * c THEN s0 + 1
              ELSE s0 END AS s1_pre, c * c * c AS c3
  FROM (SELECT tok, c,
               CAST(floor(sqrt(CAST(c * c * c AS DOUBLE))) AS BIGINT)
                 AS s0
        FROM top WHERE rk <= {NEG_VOCAB})
), isq1 AS (
  SELECT tok, c,
         CASE WHEN s1_pre * s1_pre > c3 THEN s1_pre - 1
              ELSE s1_pre END AS s1
  FROM isq
), isq2 AS (
  SELECT tok, c,
         CASE WHEN (t0 + 1) * (t0 + 1) <= s1 THEN t0 + 1 ELSE t0 END
           AS t1_pre, s1
  FROM (SELECT tok, c, s1,
               CAST(floor(sqrt(CAST(s1 AS DOUBLE))) AS BIGINT) AS t0
        FROM isq1)
), w AS (
  SELECT tok, c,
         CASE WHEN t1_pre * t1_pre > s1 THEN t1_pre - 1
              ELSE t1_pre END AS w34
  FROM isq2
), tot AS (SELECT CAST(sum(w34) AS BIGINT) AS tw FROM w),
quota AS (
  SELECT tok, c, w34,
         ({PPM_TOTAL} * w34) // tw AS fl,
         ({PPM_TOTAL} * w34) % tw AS rem
  FROM w CROSS JOIN tot
), lo AS (
  SELECT {PPM_TOTAL} - CAST(sum(fl) AS BIGINT) AS k FROM quota
), rr AS (
  SELECT tok, row_number() OVER (ORDER BY rem DESC, tok ASC) AS rrk
  FROM quota
)
SELECT q.tok, q.c, q.w34,
       CAST(q.fl + CASE WHEN r.rrk <= lo.k THEN 1 ELSE 0 END AS BIGINT)
         AS ppm
FROM quota q JOIN rr r USING (tok), lo
"""


@register("negative_sampling_table", oracle=_ORACLE)
def negative_sampling_table_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The unigram^(3/4) sampling table, value-hashed: DuckDB replays
    the counts, both ±1-corrected integer square roots, and the
    Hamilton ppm quotas."""
    return negative_sampling_table(load(spark, sf_dir, "documents"))
