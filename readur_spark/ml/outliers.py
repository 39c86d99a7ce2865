"""Embedding outlier filtering (distance-to-centroid gate).

Published recipe family: LAION / DataComp-style corpus curation drops
embedding-space OUTLIERS — vectors far from any dense region are
mislabeled, corrupted, or off-distribution samples that hurt training.
The classical cheap form (used before per-pair SemDeDup-style passes)
is the distance-to-assigned-centroid gate: cluster the corpus, then
flag every vector whose squared distance to its own centroid exceeds a
multiple of the cluster's MEAN squared distance. This module composes
the repo's integer Lloyd trajectory (ml/kmeans.py — bit-identical
cross-engine) with that gate, so the whole decision is value-hashable:
grid snap, every argmin/update, the per-cluster mean, and the flag.

The threshold is the scale-free integer cross-multiplication

    is_outlier  <=>  d * OUT_DEN > mean_d * OUT_NUM

(no division on the hot path; `mean_d = sum_d div n_c` is computed
once per cluster). The reference engine's closest analogue is its OCR
confidence gate (src/ocr/enhanced.rs:1487-1558) — a fixed scalar
quantizer; this is the embedding-space corpus form.

Scale design (10^12 vectors):
  - distances reuse the kmeans component layout: one broadcast join of
    the K*D centroid rows, one map-side-combinable (vid, cid) agg —
    no window, no skew (cluster sizes never hit a single partition);
  - per-cluster stats are K rows, broadcast back; the flag is a pure
    projection. Nothing global-sorts and nothing driver-collects.
  - int64 headroom: d <= D * (4*GRID)^2 ~ 1e9 at D=64, so sum_d stays
    exact below ~9e9 vectors per cluster; beyond that widen the sum to
    decimal(38,0) / HUGEINT on both engines (one-line change) — the
    flag inequality itself never overflows (d and mean_d are per-row
    bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.kmeans import (
    KM_ITERS,
    KM_K,
    int_components,
    kmeans_cte_sql,
    kmeans_lloyd,
)
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# outlier iff d * OUT_DEN > mean_d * OUT_NUM — i.e. d > 17/16 (6.25%
# above) the cluster mean squared distance. Squared distances
# concentrate hard in high dimension (relative sd ~ sqrt(2/D) ~ 2-3%
# effective at D=64 on near-unit embeddings), so a 6.25% excess sits
# ~2 sd out and flags the real small tail (~3% of sf0.01 vectors).
OUT_NUM = 17
OUT_DEN = 16


def centroid_distances(
    comps: DataFrame, cents: DataFrame, assign: DataFrame
) -> DataFrame:
    """(vid, cid, d): integer squared L2 from each vector to ITS
    assigned centroid. One broadcast join + one partial-agg pass."""
    diff = F.col("val") - F.col("cval")
    return (
        comps.join(assign, "vid")
        .join(F.broadcast(cents), ["cid", "pos"])
        .groupBy("vid", "cid")
        .agg(F.sum(diff * diff).alias("d"))
    )


def flag_outliers(
    dists: DataFrame, *, num: int = OUT_NUM, den: int = OUT_DEN
) -> DataFrame:
    """Adds mean_d (per-cluster integer mean squared distance) and
    is_outlier to a (vid, cid, d) frame. K-row stats, broadcast back."""
    stats = dists.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_c"), F.sum("d").alias("sum_d")
    )
    mu = F.expr("sum_d div n_c")
    return (
        dists.join(F.broadcast(stats.withColumn("mean_d", mu)), "cid")
        .withColumn(
            "is_outlier", F.col("d") * den > F.col("mean_d") * num
        )
        .drop("n_c", "sum_d")
    )


def embedding_outliers(
    vectors: DataFrame,
    k: int = KM_K,
    num_iters: int = KM_ITERS,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end: integer Lloyd -> per-vector centroid distance ->
    mean-multiple outlier flag. Returns (vid, cid, d, mean_d,
    is_outlier)."""
    comps = int_components(vectors, id_col=id_col, vec_col=vec_col)
    cents, assign = kmeans_lloyd(comps, k, num_iters)
    return flag_outliers(centroid_distances(comps, cents, assign))


# ---- driver-contract query ------------------------------------------------


def _outlier_oracle(k: int, num_iters: int) -> str:
    n = num_iters
    return kmeans_cte_sql(k, n) + f""",
    dist AS MATERIALIZED (
      SELECT comps.vid, a.cid,
             CAST(sum((comps.val - c.cval) * (comps.val - c.cval))
                  AS BIGINT) AS d
      FROM comps
      JOIN a{n} a USING (vid)
      JOIN c{n} c ON a.cid = c.cid AND comps.pos = c.pos
      GROUP BY comps.vid, a.cid
    ),
    st AS (
      SELECT cid, CAST(sum(d) AS BIGINT) // count(*) AS mean_d
      FROM dist GROUP BY cid
    )
    SELECT dist.vid, dist.cid, dist.d, st.mean_d,
           dist.d * {OUT_DEN} > st.mean_d * {OUT_NUM} AS is_outlier
    FROM dist JOIN st USING (cid)
    """


@register(
    "embedding_outlier_flags",
    oracle=_outlier_oracle(KM_K, KM_ITERS),
)
def embedding_outlier_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-to-centroid outlier gate over the embeddings table,
    value-hash-checked end-to-end: the DuckDB twin replays the full
    Lloyd trajectory, every per-vector distance, each cluster's integer
    mean, and the cross-multiplied flag."""
    vectors = load(spark, sf_dir, "embeddings")
    out = embedding_outliers(vectors)
    return out.select(
        "vid",
        "cid",
        F.col("d").cast("long").alias("d"),
        F.col("mean_d").cast("long").alias("mean_d"),
        "is_outlier",
    )
