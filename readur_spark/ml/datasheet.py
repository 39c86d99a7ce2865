"""One-row corpus datasheet (Gebru et al., "Datasheets for Datasets").

Every shipped training corpus publishes a composition card; this is
the single-pass, exact-integer core of one: size, token mass, language
spread, duplication, and concentration — the numbers a consumer needs
before the per-tier reports (mixture plans, QC rollups, drift) make
sense.

Columns (all exact integers, one row):
  n_docs, n_tokens, n_langs, n_sources,
  mean_tokens_milli   = 1000·n_tokens div n_docs
  dup_permille        = 1000·(n_docs − distinct sha) div n_docs
  top_lang_permille   = 1000·max lang count div n_docs
  top_source_permille = 1000·max source count div n_docs

Scale: ONE pass over the corpus computes the token counts and hashes
(projection + map-side-combinable aggs); the lang/source modes come
off two slim grouped frames. Nothing corpus-sized shuffles twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def corpus_datasheet(df: DataFrame) -> DataFrame:
    base = df.select(
        "lang",
        "source",
        F.sha2(F.col("text"), 256).alias("sha"),
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        ).cast("long").alias("toks"),
    )
    core = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.countDistinct("sha").cast("long").alias("n_sha"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    top_lang = (
        base.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").cast("long").alias("top_lang_c"))
    )
    top_src = (
        base.groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").cast("long").alias("top_source_c"))
    )
    return (
        core.crossJoin(F.broadcast(top_lang))
        .crossJoin(F.broadcast(top_src))
        .select(
            "n_docs",
            "n_tokens",
            "n_langs",
            "n_sources",
            F.expr("(1000L * n_tokens) div n_docs").alias(
                "mean_tokens_milli"
            ),
            F.expr("(1000L * (n_docs - n_sha)) div n_docs").alias(
                "dup_permille"
            ),
            F.expr("(1000L * top_lang_c) div n_docs").alias(
                "top_lang_permille"
            ),
            F.expr("(1000L * top_source_c) div n_docs").alias(
                "top_source_permille"
            ),
        )
    )


_ORACLE = """
WITH base AS (
  SELECT lang, source, sha256(text) AS sha,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                              t -> t <> '')) AS BIGINT) AS toks
  FROM documents
), core AS (
  SELECT count(*) AS n_docs,
         CAST(sum(toks) AS BIGINT) AS n_tokens,
         CAST(count(DISTINCT sha) AS BIGINT) AS n_sha,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources
  FROM base
), tl AS (
  SELECT CAST(max(c) AS BIGINT) AS top_lang_c
  FROM (SELECT count(*) AS c FROM base GROUP BY lang)
), ts AS (
  SELECT CAST(max(c) AS BIGINT) AS top_source_c
  FROM (SELECT count(*) AS c FROM base GROUP BY source)
)
SELECT n_docs, n_tokens, n_langs, n_sources,
       CAST((1000 * n_tokens) // n_docs AS BIGINT) AS mean_tokens_milli,
       CAST((1000 * (n_docs - n_sha)) // n_docs AS BIGINT)
         AS dup_permille,
       CAST((1000 * top_lang_c) // n_docs AS BIGINT)
         AS top_lang_permille,
       CAST((1000 * top_source_c) // n_docs AS BIGINT)
         AS top_source_permille
FROM core, tl, ts
"""


@register("corpus_datasheet", oracle=_ORACLE)
def corpus_datasheet_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus composition card, value-hashed: DuckDB
    replays the token counts, hash distinctness, and every
    concentration ratio."""
    return corpus_datasheet(load(spark, sf_dir, "documents"))
