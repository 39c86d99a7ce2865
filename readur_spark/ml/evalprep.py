"""Evaluation-prep planning: few-shot exemplars and canary insertion.

Two data-side jobs every LLM eval/training stack runs, both pure
deterministic plans (no model anywhere):

  1. FEW-SHOT EXEMPLAR SELECTION: k exemplars per class for prompt
     construction.  The naive `LIMIT k` per class silently couples
     the prompt to storage order; the reproducible recipe is
     content-addressed ranking — md5('shot'‖doc) per candidate,
     row_number per class, keep k — so every re-run, re-shard, and
     engine builds the byte-identical prompt.  The plan row carries
     the exemplar rank and the md5 of the assembled prompt prefix so
     the concatenation itself is value-checked.

  2. CANARY INSERTION PLAN (secret-sharer / memorization probes,
     Carlini et al.): plant unique canary strings into a
     deterministic per-mille sample of training docs, so a later
     extraction attack can measure memorization.  The plan is
     content-addressed end-to-end: membership by md5 bucket, the
     canary string derived from the doc key (unique by
     construction), the insertion offset an md5 draw over the text
     length.  Emitting a PLAN (doc, canary, offset) rather than
     mutated text keeps the payload untouched until the final
     projection — and makes the whole thing SQL-replayable.

Scale: both are projections plus one slim per-class window (few-shot
classes are a handful; the window frame is |classes|·|candidates-
per-class| after an early sample filter). No payload shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

SHOTS_K = 3          # exemplars per class
CANARY_PERMILLE = 20 # fraction of docs receiving a canary


def fewshot_plan(
    df: DataFrame,
    *,
    class_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = SHOTS_K,
) -> DataFrame:
    """(class, shot_rank, doc_id, prompt_md5): k content-addressed
    exemplars per class; prompt_md5 hashes 'Q: <text>\\nA: <class>\\n'
    — the assembled exemplar block — so formatting is value-checked."""
    h = F.expr(
        f"cast(conv(substring(md5(concat('shot', cast({id_col} as "
        f"string))), 1, 8), 16, 10) as bigint)"
    )
    w = Window.partitionBy(class_col).orderBy("h", id_col)
    ranked = (
        df.select(
            F.col(class_col).alias("class"),
            F.col(id_col),
            F.col(text_col).alias("_t"),
            h.alias("h"),
        )
        .withColumn(
            "shot_rank",
            F.row_number().over(
                Window.partitionBy("class").orderBy("h", id_col)
            ),
        )
        .filter(F.col("shot_rank") <= k)
    )
    prompt = F.concat(
        F.lit("Q: "), F.col("_t"), F.lit("\nA: "), F.col("class"),
        F.lit("\n"),
    )
    return ranked.select(
        "class",
        "shot_rank",
        id_col,
        F.md5(prompt).alias("prompt_md5"),
    )


_FEWSHOT_ORACLE = f"""
WITH ranked AS (
  SELECT lang AS class, doc_id, text,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY CAST('0x' || substring(
             md5('shot' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT),
             doc_id) AS shot_rank
  FROM documents
)
SELECT class, CAST(shot_rank AS INT) AS shot_rank, doc_id,
       md5('Q: ' || text || chr(10) || 'A: ' || class || chr(10))
         AS prompt_md5
FROM ranked WHERE shot_rank <= {SHOTS_K}
"""


@register("fewshot_prompt_plan", oracle=_FEWSHOT_ORACLE)
def fewshot_prompt_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed few-shot exemplar plan, value-hashed: DuckDB
    replays the per-class md5 ranking and the md5 of every assembled
    exemplar block."""
    out = fewshot_plan(load(spark, sf_dir, "documents"))
    return out.select(
        "class", F.col("shot_rank").cast("int").alias("shot_rank"),
        "doc_id", "prompt_md5",
    )


def canary_plan(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    permille: int = CANARY_PERMILLE,
) -> DataFrame:
    """(doc_id, canary, insert_at, planted_md5): the deterministic
    canary-insertion plan over a content-addressed per-mille sample.
    planted_md5 hashes the text WITH the canary spliced at insert_at,
    so the final projection is value-checked without emitting it."""
    h = F.expr(
        f"cast(conv(substring(md5(concat('can', cast({id_col} as "
        f"string))), 1, 8), 16, 10) as bigint)"
    )
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_t"),
        h.alias("h"),
    ).filter(F.col("h") % 1000 < permille)
    canary = F.concat(
        F.lit("canary-"),
        F.md5(F.concat(F.lit("cv"), F.col(id_col).cast("string"))),
    )
    insert_at = F.expr("1 + h % greatest(1L, length(_t))")
    planted = F.concat(
        F.expr("substring(_t, 1, cast(insert_at - 1 as int))"),
        F.lit(" "),
        F.col("canary"),
        F.lit(" "),
        F.expr("substring(_t, cast(insert_at as int))"),
    )
    return (
        base.withColumn("canary", canary)
        .withColumn("insert_at", insert_at)
        .select(
            id_col,
            "canary",
            "insert_at",
            F.md5(planted).alias("planted_md5"),
        )
    )


_CANARY_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         CAST('0x' || substring(
           md5('can' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM documents
), sampled AS (
  SELECT doc_id, text, h,
         'canary-' || md5('cv' || CAST(doc_id AS VARCHAR)) AS canary,
         1 + h % greatest(1, length(text)) AS insert_at
  FROM base WHERE h % 1000 < {CANARY_PERMILLE}
)
SELECT doc_id, canary, insert_at,
       md5(substring(text, 1, CAST(insert_at - 1 AS INT)) || ' ' ||
           canary || ' ' || substring(text, CAST(insert_at AS INT)))
         AS planted_md5
FROM sampled
"""


@register("canary_insertion_plan", oracle=_CANARY_ORACLE)
def canary_insertion_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-canary insertion plan, value-hashed including the
    md5 of every planted document — membership, canary derivation,
    offsets, and the splice itself all replay in DuckDB."""
    return canary_plan(load(spark, sf_dir, "documents"))
