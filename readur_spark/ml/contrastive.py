"""Hard-negative mining for contrastive embedding training.

The published recipe (DPR, Karpukhin et al. 2020; SimCSE; the
sentence-transformers mining utilities): for each anchor, candidates
ABOVE a positive threshold are near-duplicates / gold positives
(excluded — training on them as negatives poisons the loss), and the
most valuable negatives are the HARD band just below it — similar
enough to be confusable, dissimilar enough to be true negatives.
Random negatives are trivially separable and contribute ~no gradient.

Output: per anchor, the top-H candidates with
NEG_T ≤ cos(anchor, cand) < POS_T, ranked by similarity
(deterministic vec_id tie-break).

Scale design: the anchor set is a small sample (per-mille of the
corpus — mining is per training batch, not per corpus), so the
anchor frame is BROADCAST and scoring is one pass over the vector
table (no shuffle of the vectors). The band filter runs BEFORE the
per-anchor ranking shuffle, so only the hard band (a few rows per
anchor·candidate-block) crosses; ranking is a window over the slim
(anchor, cand, sim) frame. At 10^9+ vectors the scoring pass drops
onto the existing IVF index (ml/similarity.py: pruned-probe scan)
instead of the full scan — the band/rank stages are unchanged.

Reference analogue: none in readur (exact-hash dedup only) — this is
part of the LLM-data tier's similarity family
(SURVEY §2 ANN/embedding rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.ml.similarity import cosine
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

ANCHOR_MOD = 50  # vec_id % 50 == 0 → the anchor sample
POS_T = 0.80     # ≥ POS_T: positive/near-dup — excluded
NEG_T = 0.30     # < NEG_T: easy negative — excluded
TOP_H = 5        # hard negatives kept per anchor


def hard_negatives(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    anchor_mod: int = ANCHOR_MOD,
    pos_t: float = POS_T,
    neg_t: float = NEG_T,
    top_h: int = TOP_H,
) -> DataFrame:
    """(anchor_id, neg_id, sim, rank) hard-negative table."""
    anchors = vectors.filter(F.col(id_col) % anchor_mod == 0).select(
        F.col(id_col).alias("anchor_id"), F.col(vec_col).alias("av")
    )
    scored = (
        vectors.crossJoin(F.broadcast(anchors))
        .filter(F.col(id_col) != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col(id_col).alias("neg_id"),
            cosine(F.col(vec_col), F.col("av")).alias("_s"),
        )
        .filter((F.col("_s") >= neg_t) & (F.col("_s") < pos_t))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("_s"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_h)
        .select(
            "anchor_id",
            "neg_id",
            F.round(F.col("_s"), 3).alias("sim"),
            "rank",
        )
    )


_ORACLE = f"""
WITH a AS (
  SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av
  FROM embeddings WHERE vec_id % {ANCHOR_MOD} = 0
), s AS (
  SELECT a.anchor_id, e.vec_id AS neg_id,
         list_cosine_similarity(e.embedding::DOUBLE[], a.av) AS s
  FROM embeddings e CROSS JOIN a
  WHERE e.vec_id <> a.anchor_id
), band AS (
  SELECT anchor_id, neg_id, s,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY s DESC, neg_id ASC) AS rank
  FROM s WHERE s >= {NEG_T} AND s < {POS_T}
)
SELECT anchor_id, neg_id, round(s, 3) AS sim, rank
FROM band WHERE rank <= {TOP_H}
"""


@register("contrastive_hard_negatives", oracle=_ORACLE)
def contrastive_hard_negatives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DPR-style hard-negative mining over the embeddings table,
    value-hashed: DuckDB replays the anchor sample, the cosine band
    filter, and the per-anchor ranking with identical tie-breaks."""
    return hard_negatives(load(spark, sf_dir, "embeddings"))
