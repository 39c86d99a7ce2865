"""Posting-list compression accounting — Elias γ/δ gap-coding costs.

Every serious inverted index (Lucene, the WAND/BMW literature,
Witten-Moffat-Bell "Managing Gigabytes") stores posting lists as
DELTA-CODED doc-id gaps under a universal integer code; whether an
index fits in memory at 10^12 documents is decided by exactly the
arithmetic this module does. Elias γ spends 2·⌊log2 g⌋ + 1 bits on a
gap g; Elias δ spends ⌊log2 g⌋ + 2·⌊log2(⌊log2 g⌋ + 1)⌋ + 1 (Elias,
IEEE-IT 1975). Both are pure functions of ⌊log2⌋, so the whole
accounting runs on the repo's exact `int_log2` (binary-string length,
no libm) and replays bit-for-bit in DuckDB.

This is the capacity-planning twin of operators/posting.py's index:
given the corpus's postings, how many bits does each df-decile of the
vocabulary cost raw (64-bit ids) vs γ vs δ? The Zipf shape makes the
answer non-obvious — stop-word lists have tiny gaps (γ ≈ 1–3
bits/posting) while hapax lists cost a near-full id each — and the
rollup by ⌊log2 df⌋ bucket exposes exactly that curve.

Scale design (10^12 docs): the gap computation is one LAG window per
token over the slim (token, doc_id) frame — partitioned by token, the
same key the posting build already aggregates on, so the exchange is
shared; everything after is map-side-combinable integer sums. The
mega-posting-list note from the search tier applies (a stop word's
window partition is corpus-sized; the bucketed build bounds it).

Reference tie-in: the reference leans on Postgres GIN compression
(posting trees) for the same purpose
(migrations/20250620100000_initial_schema.sql:41-43); this makes the
cost model explicit and engine-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

RAW_BITS_PER_ID = 64


def posting_gap_bits(postings: DataFrame) -> DataFrame:
    """(token, df, raw_bits, gamma_bits, delta_bits) per token.
    Gaps are successor differences of the sorted doc-id list with the
    first id stored as id + 1 (gaps must be >= 1); lg = ⌊log2 gap⌋ via
    binary-string length."""
    w = Window.partitionBy("token").orderBy("doc_id")
    gaps = postings.select(
        "token",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w),
            F.col("doc_id") + 1,
        ).cast("long").alias("gap"),
    )
    lg = "(length(bin(gap)) - 1)"
    lglg = f"(length(bin({lg} + 1)) - 1)"
    return (
        gaps.select(
            "token",
            F.expr(f"2L * {lg} + 1L").alias("g_bits"),
            F.expr(f"{lg} + 2L * {lglg} + 1L").alias("d_bits"),
        )
        .groupBy("token")
        .agg(
            F.count("*").cast("long").alias("df"),
            (F.count("*") * RAW_BITS_PER_ID).cast("long").alias("raw_bits"),
            F.sum("g_bits").cast("long").alias("gamma_bits"),
            F.sum("d_bits").cast("long").alias("delta_bits"),
        )
    )


def compression_by_df_bucket(per_token: DataFrame) -> DataFrame:
    """Roll the per-token costs up by ⌊log2 df⌋ bucket — the Zipf
    curve of index cost."""
    return (
        per_token.withColumn(
            "df_log2_bucket", F.expr("length(bin(df)) - 1").cast("long")
        )
        .groupBy("df_log2_bucket")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("df").cast("long").alias("n_postings"),
            F.sum("raw_bits").cast("long").alias("raw_bits"),
            F.sum("gamma_bits").cast("long").alias("gamma_bits"),
            F.sum("delta_bits").cast("long").alias("delta_bits"),
        )
    )


@register(
    "postings_compression",
    oracle=f"""
    WITH p AS (
      SELECT DISTINCT tok AS token, doc_id
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(text, ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
    ),
    gaps AS (
      SELECT token,
             coalesce(doc_id - lag(doc_id) OVER
                        (PARTITION BY token ORDER BY doc_id),
                      doc_id + 1) AS gap
      FROM p
    ),
    bits AS (
      SELECT token,
             2 * (length(bin(gap)) - 1) + 1 AS g_bits,
             (length(bin(gap)) - 1)
               + 2 * (length(bin(length(bin(gap)))) - 1) + 1 AS d_bits
      FROM gaps
    ),
    per_tok AS (
      SELECT token, count(*) AS df,
             count(*) * {RAW_BITS_PER_ID} AS raw_bits,
             sum(g_bits) AS gamma_bits, sum(d_bits) AS delta_bits
      FROM bits GROUP BY token
    )
    SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_log2_bucket,
           count(*) AS n_tokens,
           CAST(sum(df) AS BIGINT) AS n_postings,
           CAST(sum(raw_bits) AS BIGINT) AS raw_bits,
           CAST(sum(gamma_bits) AS BIGINT) AS gamma_bits,
           CAST(sum(delta_bits) AS BIGINT) AS delta_bits
    FROM per_tok GROUP BY 1
    """,
)
def postings_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """γ/δ gap-coding cost of the documents posting index, rolled up
    by df decile — gaps, both Elias codes, and the bucket rollup all
    integer-exact and replayed by DuckDB. (The oracle's
    length(bin(lg)) equals length(bin(lg + 1)) - 1's Spark twin
    because lg >= 0 and bin() of the +1 shift is evaluated the same
    way both sides — both engines compute ⌊log2(lg + 1)⌋.)"""
    from readur_spark.operators.posting import build_postings

    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text").select(
        "token", "doc_id"
    )
    return compression_by_df_bucket(posting_gap_bits(postings))
