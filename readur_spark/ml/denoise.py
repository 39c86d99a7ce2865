"""Denoising-objective planning: T5 span corruption and FIM splits.

Two pretraining objectives whose DATA-side work is a deterministic
plan over the corpus (the trainer consumes the plan; the pipeline's
job is to emit it reproducibly):

  1. SPAN CORRUPTION (T5, Raffel et al. 2020; UL2 denoisers): mask
     ~15% of tokens in spans of mean length 3, replace each span
     with a sentinel. The published sampler is random; at pipeline
     scale the masks must be CONTENT-ADDRESSED so a resumed or
     re-sharded run regenerates byte-identical training examples.
     Deterministic scheme: s = max(1, (n·15%)/3) spans; the doc is
     cut into s equal strata of L = n div s tokens and span k sits
     at a stratum-local offset drawn from md5('sc'‖doc‖k) — spans
     are non-overlapping BY CONSTRUCTION (no rejection loop, no
     cross-span coordination, embarrassingly parallel).

  2. FIM — fill-in-the-middle (Bavarian et al. 2022): move a random
     middle substring to the end (PSM/SPM modes) for ~50% of
     documents. Again content-addressed: two md5 draws pick the cut
     points, parity picks the mode. The plan row carries the three
     segment lengths and each segment's md5, so the full character-
     exact split is value-checked without shipping the text.

Scale: both plans are pure projections + one bounded explode (s ≈
n/20 rows per doc) — no shuffle at all; the oracle twins replay the
md5 draws and the integer arithmetic exactly.

Reference analogue: none (readur stops at extraction); these are the
training-data tier's objective planners, composing with
ml/packing.py's sequence packing downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

NOISE_PCT = 15   # corrupted-token share, percent
MEAN_SPAN = 3    # fixed span length (T5's mean_noise_span_length)
MIN_TOKENS = 20  # docs below this skip span corruption
FIM_MIN_CHARS = 10


def _md5_long(expr: str) -> str:
    """Spark SQL: first 8 md5 hex chars of `expr` as a long."""
    return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) as bigint)"


def span_corruption_plan(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, span_id, start_tok, len_tok, n_tokens, n_spans) —
    one row per sentinel span, non-overlapping by stratification."""
    base = df.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") >= MIN_TOKENS)
    planned = base.select(
        id_col,
        "n_tokens",
        F.expr(
            f"greatest(1L, (n_tokens * {NOISE_PCT}) div 100 div {MEAN_SPAN})"
        ).alias("n_spans"),
    ).withColumn("stratum_len", F.expr("n_tokens div n_spans"))
    spans = planned.select(
        id_col,
        "n_tokens",
        "n_spans",
        "stratum_len",
        F.explode(F.expr("sequence(0L, n_spans - 1)")).alias("span_id"),
    )
    h = _md5_long(
        f"concat('sc', cast({id_col} as string), '_', "
        "cast(span_id as string))"
    )
    return spans.select(
        id_col,
        "span_id",
        F.expr(
            f"span_id * stratum_len + {h} % (stratum_len - {MEAN_SPAN} + 1)"
        ).alias("start_tok"),
        F.lit(MEAN_SPAN).cast("long").alias("len_tok"),
        "n_tokens",
        "n_spans",
    )


_SPAN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents
), base AS (
  SELECT doc_id, n_tokens,
         greatest(1, (n_tokens * {NOISE_PCT}) // 100 // {MEAN_SPAN})
           AS n_spans,
         n_tokens // greatest(1, (n_tokens * {NOISE_PCT}) // 100
                              // {MEAN_SPAN}) AS stratum_len
  FROM toks WHERE n_tokens >= {MIN_TOKENS}
), spans AS (
  SELECT doc_id, n_tokens, n_spans, stratum_len,
         unnest(range(n_spans)) AS span_id
  FROM base
)
SELECT doc_id,
       CAST(span_id AS BIGINT) AS span_id,
       CAST(span_id * stratum_len
            + CAST('0x' || substring(
                md5('sc' || CAST(doc_id AS VARCHAR) || '_'
                    || CAST(span_id AS VARCHAR)), 1, 8) AS BIGINT)
              % (stratum_len - {MEAN_SPAN} + 1) AS BIGINT) AS start_tok,
       CAST({MEAN_SPAN} AS BIGINT) AS len_tok,
       n_tokens,
       CAST(n_spans AS BIGINT) AS n_spans
FROM spans
"""


@register("span_corruption_plan", oracle=_SPAN_ORACLE)
def span_corruption_plan_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """T5 span-corruption mask plan, value-hashed: DuckDB replays the
    token counts, span budget, stratification, and every md5 offset
    draw."""
    return span_corruption_plan(load(spark, sf_dir, "documents"))


def fim_split_plan(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, mode, prefix_len, middle_len, suffix_len, prefix_md5,
    middle_md5, suffix_md5) — content-addressed FIM cuts. The segment
    md5s prove the character-exact split without shipping text."""
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        F.length(text_col).cast("long").alias("_n"),
    ).filter(F.col("_n") >= FIM_MIN_CHARS)
    h1 = _md5_long(f"concat('fim1', cast({id_col} as string))")
    h2 = _md5_long(f"concat('fim2', cast({id_col} as string))")
    cut = base.select(
        id_col,
        "_t",
        "_n",
        F.expr(f"{h1} % (_n - 1)").alias("c1"),
        F.expr(f"({h1} + {h2}) % 2").alias("_parity"),
        F.expr(f"{h2}").alias("_h2"),
    ).withColumn("c2", F.expr("c1 + 1 + _h2 % (_n - c1)"))
    return cut.select(
        id_col,
        F.expr("if(_parity = 0, 'psm', 'spm')").alias("mode"),
        F.col("c1").alias("prefix_len"),
        (F.col("c2") - F.col("c1")).alias("middle_len"),
        (F.col("_n") - F.col("c2")).alias("suffix_len"),
        F.md5(F.expr("substring(_t, 1, cast(c1 as int))")).alias(
            "prefix_md5"
        ),
        F.md5(
            F.expr("substring(_t, cast(c1 + 1 as int), cast(c2 - c1 as int))")
        ).alias("middle_md5"),
        F.md5(F.expr("substring(_t, cast(c2 + 1 as int))")).alias(
            "suffix_md5"
        ),
    )


_FIM_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS n,
         CAST('0x' || substring(
           md5('fim1' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h1,
         CAST('0x' || substring(
           md5('fim2' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h2
  FROM documents WHERE length(text) >= {FIM_MIN_CHARS}
), cut AS (
  SELECT doc_id, t, n, h1 % (n - 1) AS c1,
         (h1 + h2) % 2 AS parity, h2
  FROM base
), cut2 AS (
  SELECT *, c1 + 1 + h2 % (n - c1) AS c2 FROM cut
)
SELECT doc_id,
       CASE WHEN parity = 0 THEN 'psm' ELSE 'spm' END AS mode,
       c1 AS prefix_len,
       c2 - c1 AS middle_len,
       n - c2 AS suffix_len,
       md5(substring(t, 1, c1)) AS prefix_md5,
       md5(substring(t, c1 + 1, c2 - c1)) AS middle_md5,
       md5(substring(t, c2 + 1)) AS suffix_md5
FROM cut2
"""


@register("fim_split_plan", oracle=_FIM_ORACLE)
def fim_split_plan_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM (fill-in-the-middle) split plan, value-hashed including the
    md5 of every character segment — the split itself is verified,
    not just the cut arithmetic."""
    return fim_split_plan(load(spark, sf_dir, "documents"))
