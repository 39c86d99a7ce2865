"""Curriculum interleaving — difficulty-ordered, shard-stratified
training order.

Curriculum learning (Bengio et al., ICML 2009) trains easy→hard; the
classic text difficulty proxy is SENTENCE LENGTH (their language-model
experiment orders by exactly that). A distributed corpus additionally
has to respect the data-loader's sharding: each of S loader shards
must independently hold a stratified sample of the difficulty
distribution AND its own easy→hard order, or shard-sequential loaders
see a difficulty distribution that drifts with training step. This
module produces that plan:

  shard      = content-addressed md5 bucket of the doc key (the
               ml/mixing.py convention — reshuffling the corpus never
               moves a document between shards);
  difficulty = milli words-per-sentence, integer div (the
               ml/textqc.py readability counts, so the proxy is exact
               on every engine);
  rank       = row_number within shard over (difficulty, tiebreak
               hash) — each shard's epoch order.

Scale design (10^12 docs): there is NO global sort — the only window
partitions by shard, so the work is S independent sorts of N/S keys,
which is precisely the per-shard epoch-order materialization the
training loader performs anyway (in production S is the loader's
shard count, thousands, not this demo's 8). Everything upstream of
the window is a slim (key, shard, difficulty) projection; the payload
stays at the scan.

Reference tie-in: the reference orders its OCR work queue by a
priority prefix (SURVEY §2 B21, operators/partitioning.py); this is
the training-side twin — order as a FUNCTION of content, not a queue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.ml.textqc import readability_counts
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

N_SHARDS = 8
_SHARD_SALT = "cur-shard"
_ORD_SALT = "cur-ord"


def _md5_long(key: Column, salt: str) -> Column:
    """First 8 md5 hex chars of salt||key as a long (ml/mixing.py's
    cross-engine hash idiom)."""
    return F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(salt), key), "UTF-8")), 1, 8
        ),
        16, 10,
    ).cast("long")


def curriculum_interleave(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """(id, shard, difficulty_mwps, rank_in_shard) — shard assignment
    plus easy→hard epoch order per shard. Zero-word docs carry no
    difficulty evidence and are excluded (the length gates own them)."""
    c = readability_counts(F.col(text_col))
    key = F.col(id_col).cast("string")
    slim = docs.select(
        F.col(id_col),
        (_md5_long(key, _SHARD_SALT) % n_shards).alias("shard"),
        c["n_words"].alias("_w"),
        c["n_sentences"].alias("_s"),
        _md5_long(key, _ORD_SALT).alias("_tie"),
    ).where(F.col("_w") > 0)
    diff = F.expr("(1000L * _w) div _s")
    w = Window.partitionBy("shard").orderBy(
        "difficulty_mwps", "_tie", id_col
    )
    return (
        slim.withColumn("difficulty_mwps", diff)
        .select(
            id_col, "shard", "difficulty_mwps",
            F.row_number().over(w).cast("long").alias("rank_in_shard"),
        )
    )


@register(
    "curriculum_interleave",
    oracle=f"""
    WITH c AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5('{_SHARD_SALT}' || doc_id), 1, 8))
                  AS UBIGINT) % {N_SHARDS} AS shard,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
                 '\\s+'), x -> x <> '')) AS n_words,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))
               AS n_sentences,
             CAST(concat('0x', substr(md5('{_ORD_SALT}' || doc_id), 1, 8))
                  AS UBIGINT) AS tie
      FROM documents
    )
    SELECT doc_id,
           CAST(shard AS BIGINT) AS shard,
           CAST((1000 * n_words) // n_sentences AS BIGINT)
             AS difficulty_mwps,
           CAST(row_number() OVER (
             PARTITION BY shard
             ORDER BY (1000 * n_words) // n_sentences, tie, doc_id
           ) AS BIGINT) AS rank_in_shard
    FROM c WHERE n_words > 0
    """,
)
def curriculum_interleave_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Curriculum plan over documents — shard hash, integer
    difficulty, and every per-shard rank replayed exactly by DuckDB."""
    return curriculum_interleave(load(spark, sf_dir, "documents"))
