"""Margin-based bitext mining over document embeddings (the
CCMatrix/CCAligned recipe).

Parallel-corpus mining embeds every document into a shared
cross-lingual space (LASER) and pairs documents across languages not
by raw cosine — which is miscalibrated across hubness regions — but
by the RATIO MARGIN of Artetxe & Schwenk (ACL 2019): a candidate
pair's cosine divided by the mean cosine of each side's k nearest
neighbors,

    margin(x, y) = cos(x, y) /
        ((mean_{z in NN_k(x)} cos(x, z)
          + mean_{z in NN_k(y)} cos(y, z)) / 2),

keeping forward-top-1 pairs whose margin clears a threshold. This is
the alignment stage that sits on top of the hreflang clusters
(ml/hreflang.py) when pages do NOT declare their translations — the
dominant case in the wild.

Scale design (10^12 documents): the margin SCORE is per-candidate and
cheap; what must never happen at scale is all-pairs candidate
generation. This module therefore separates the two: ``margin_pairs``
scores an arbitrary candidate frame, and the driver query feeds it
the exhaustive cross-language frame only as the small-scale oracle
baseline — at corpus scale the candidate frame comes from the
existing ANN tier (ml/similarity.py IVF/LSH bucket joins), exactly
the brute-force-baseline / blocked-scale-path split the ANN queries
themselves use. Neighbor means are per-source windows over the slim
(src, dst, sim) frame; the payload never appears.

Reference tie-in: the reference stores per-document language and
routes OCR by it (src/ocr/enhanced.rs language configs); this is the
corpus-level operation that language routing enables — aligning the
routed outputs across languages.

The driver query mines lang 'en' vs 'fr' (the two largest synthetic
languages), k = 4, threshold 1.05; embeddings join documents on
vec_id = doc_id (TESTDATA.md row alignment). The DuckDB oracle
replays the same windows with list_cosine_similarity; scores publish
at 3 decimals (the ANN-tier precision convention)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.ml.similarity import dot, norm
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

KNN_K = 4
MARGIN_THRESHOLD = 1.05
LANG_SRC = "en"
LANG_DST = "fr"


def lang_embeddings(
    spark: SparkSession, sf_dir: str, langs: list[str]
) -> DataFrame:
    """(id, lang, v) — embeddings tagged with their document's
    language (vec_id = doc_id row alignment), filtered to the mining
    pair. The documents side is a slim (doc_id, lang) projection and
    broadcasts."""
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    )
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), "lang"
    ).filter(F.col("lang").isin(langs))
    return emb.join(F.broadcast(docs), "id")


def margin_pairs(
    cand: DataFrame, *, k: int = KNN_K, threshold: float = MARGIN_THRESHOLD
) -> DataFrame:
    """Score a candidate frame (src_id, dst_id, sim) with the ratio
    margin and keep forward-top-1 pairs. Three windows over the slim
    candidate frame — one rank per direction for the k-NN means, one
    for forward top-1 — no payload, no Python."""
    w_src = Window.partitionBy("src_id").orderBy(
        F.desc("sim"), F.asc("dst_id")
    )
    w_dst = Window.partitionBy("dst_id").orderBy(
        F.desc("sim"), F.asc("src_id")
    )
    ranked = cand.select(
        "src_id", "dst_id", "sim",
        F.row_number().over(w_src).alias("r_src"),
        F.row_number().over(w_dst).alias("r_dst"),
    )
    # every consumer below needs only rows inside some top-k: slice
    # them out ONCE and materialize (eager localCheckpoint, the
    # components.py convention) so the candidate scoring + both window
    # sorts run a single time instead of once per consumer — the frame
    # that survives is O((|A| + |B|)·k), not O(|A|·|B|).
    topk = ranked.filter(
        (F.col("r_src") <= k) | (F.col("r_dst") <= k)
    ).localCheckpoint(eager=True)
    knn_src = (
        topk.filter(F.col("r_src") <= k)
        .groupBy("src_id")
        .agg(F.avg("sim").alias("knn_src"))
    )
    knn_dst = (
        topk.filter(F.col("r_dst") <= k)
        .groupBy("dst_id")
        .agg(F.avg("sim").alias("knn_dst"))
    )
    top1 = topk.filter(F.col("r_src") == 1).drop("r_src", "r_dst")
    scored = (
        top1.join(knn_src, "src_id")
        .join(knn_dst, "dst_id")
        .withColumn(
            "margin",
            F.col("sim") / ((F.col("knn_src") + F.col("knn_dst")) / 2),
        )
    )
    return scored.select(
        "src_id", "dst_id",
        F.round("sim", 3).alias("sim"),
        F.round("margin", 3).alias("margin"),
        (F.col("margin") >= threshold).alias("keep"),
    )


@register(
    "bitext_margin_mine",
    oracle=f"""
    WITH tagged AS (
      SELECT e.vec_id AS id, d.lang, e.embedding AS v
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE d.lang IN ('{LANG_SRC}', '{LANG_DST}')
    ),
    cand AS (
      SELECT a.id AS src_id, b.id AS dst_id,
             list_cosine_similarity(a.v, b.v) AS sim
      FROM tagged a, tagged b
      WHERE a.lang = '{LANG_SRC}' AND b.lang = '{LANG_DST}'
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY src_id
                           ORDER BY sim DESC, dst_id) AS r_src,
        row_number() OVER (PARTITION BY dst_id
                           ORDER BY sim DESC, src_id) AS r_dst
      FROM cand
    ),
    knn_s AS (
      SELECT src_id, avg(sim) AS knn_src FROM ranked
      WHERE r_src <= {KNN_K} GROUP BY src_id
    ),
    knn_d AS (
      SELECT dst_id, avg(sim) AS knn_dst FROM ranked
      WHERE r_dst <= {KNN_K} GROUP BY dst_id
    )
    SELECT t.src_id, t.dst_id,
           round(t.sim, 3) AS sim,
           round(t.sim / ((s.knn_src + d.knn_dst) / 2), 3) AS margin,
           t.sim / ((s.knn_src + d.knn_dst) / 2) >= {MARGIN_THRESHOLD}
             AS keep
    FROM ranked t
    JOIN knn_s s USING (src_id) JOIN knn_d d USING (dst_id)
    WHERE t.r_src = 1
    """,
)
def bitext_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine en→fr document pairs by ratio margin — the brute-force
    candidate frame is the oracle baseline (at corpus scale the ANN
    tier generates candidates instead); forward-top-1 selection, both
    k-NN denominators, and the keep gate all replayed by DuckDB."""
    tagged = lang_embeddings(spark, sf_dir, [LANG_SRC, LANG_DST])
    # pre-partition the probe side on the first window's key with an
    # EXPLICIT count: the small parquet source arrives as one
    # partition, and AQE — seeing only the slim probe bytes, not the
    # |dst|-fold compute expansion behind the cross join — would
    # coalesce a bare repartition right back to it, pinning the cosine
    # projection to one core. The explicit count is honored, the
    # scoring fans out, and w_src's exchange reuses the key.
    # per-vector norms are computed ONCE per side before the join (not
    # three HOF aggregates per PAIR, which is what cosine(a, b) inside
    # the product would cost); dot/(|a|·|b|) evaluates the identical
    # double expression, so the 3-decimal scores are unchanged.
    n_parts = spark.sparkContext.defaultParallelism
    src = tagged.filter(F.col("lang") == LANG_SRC).select(
        F.col("id").alias("src_id"), F.col("v").alias("sv"),
        norm(F.col("v")).alias("svn"),
    ).repartition(n_parts, "src_id")
    dst = tagged.filter(F.col("lang") == LANG_DST).select(
        F.col("id").alias("dst_id"), F.col("v").alias("dv"),
        norm(F.col("v")).alias("dvn"),
    )
    cand = src.crossJoin(F.broadcast(dst)).select(
        "src_id", "dst_id",
        (dot(F.col("sv"), F.col("dv"))
         / (F.col("svn") * F.col("dvn"))).alias("sim"),
    )
    return margin_pairs(cand)
