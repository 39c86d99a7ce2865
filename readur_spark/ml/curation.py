"""End-to-end corpus curation — the composed training-data pipeline:
near-dup clustering → keep one representative per cluster → quality
gates → per-language yield accounting.

This is the shape a 100 TB pretraining-data run actually executes
(dedup THEN filter THEN stats), composed entirely from this engine's
own operators (ml/dedup.jaccard_pairs, ml/components) and Catalyst
expressions — and, because every stage is SQL-expressible, the WHOLE
pipeline is value-hash-checked against one DuckDB query (recursive-CTE
components + anti-join + filters), not just its pieces.

Scale shape: the only payload-bearing frames are the initial scan and
the final filter; dedup winners and QC signals ride slim projections.
The anti-join's right side (non-representative ids) is a fraction of
the corpus and AQE-broadcasts when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.components import _PAIR_SQL, connected_components
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

MIN_TOKENS = 30
MIN_DISTINCT_RATIO = 0.35


def curate(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """docs + near-dup pairs → the kept (curated) document set."""
    labels = connected_components(pairs)
    non_reps = labels.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias("doc_id")
    )
    kept = docs.join(non_reps, "doc_id", "left_anti")
    toks = F.split(F.col("text"), " ")
    return (
        kept.withColumn("n_tokens", F.size(toks))
        .withColumn(
            "distinct_ratio",
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
        )
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("distinct_ratio") >= MIN_DISTINCT_RATIO)
        )
    )


@register(
    "curation_pipeline",
    oracle=f"""
    WITH RECURSIVE {_PAIR_SQL},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id
      WHERE r.comp < e.b
    ),
    comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
    non_reps AS (SELECT id AS doc_id FROM comps WHERE id <> comp),
    kept AS (
      SELECT d.doc_id, d.lang, string_split(d.text, ' ') AS toks
      FROM documents d ANTI JOIN non_reps nr USING (doc_id)
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs_kept,
           CAST(sum(len(toks)) AS BIGINT) AS total_tokens_kept
    FROM kept
    WHERE len(toks) >= {MIN_TOKENS}
      AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= {MIN_DISTINCT_RATIO}
    GROUP BY lang
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pipeline's per-language yield: docs kept and tokens
    kept after near-dup representative selection + QC gates."""
    from readur_spark.ml.dedup import jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs, "doc_id", "text", ["lang", "source"],
        threshold=0.8, df_cap=450, n_shingle=1,
    )
    kept = curate(docs, pairs)
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens_kept"),
    )
