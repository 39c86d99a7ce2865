"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine — a Catalyst expression (F.aggregate /
F.zip_with dot product), no UDF, fully codegen'd. Scale path:
random-hyperplane LSH bucketing — candidates share a signed-projection
bucket, exact rerank inside buckets only. At 10^9+ vectors the bucket
join replaces the O(n) scan per query; recall is tunable via number of
tables/planes (verified against brute force in pytest).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = vectors.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 3).alias("sim")
    )
    return scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round(list_cosine_similarity(embedding, qv), 3) AS sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY list_cosine_similarity(embedding, qv) DESC, vec_id
    LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query = vec_id 0 (deterministic
    tie-break by vec_id)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    joined = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qv))
    sim = cosine(F.col("embedding"), F.col("qv"))
    return (
        joined.select("vec_id", F.round(sim, 3).alias("sim"), sim.alias("_s"))
        .orderBy(F.desc("_s"), F.asc("vec_id"))
        .limit(10)
        .drop("_s")
    )


@register(
    "embedding_neardup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding, b.embedding), 3) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.label = b.label
      AND list_cosine_similarity(a.embedding, b.embedding) >= 0.9
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection, blocked by label (the
    blocking column stands in for an LSH bucket at this scale)."""
    emb = load(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.label") == F.col("b.label")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(sim, 3).alias("sim"),
            sim.alias("_s"),
        )
        .filter(F.col("_s") >= 0.9)
        .drop("_s")
    )


# ---- LSH-bucketed ANN (scale path) ------------------------------------------


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.normal(size=(n_planes, dim)).astype(np.float64)


def with_lsh_bucket(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-projection bucket id per vector (vectorized matmul per
    Arrow batch)."""
    planes = random_hyperplanes(dim, n_planes, seed)

    def bucketize(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                yield pdf.assign(bucket=pd.Series([], dtype="int64"))
                continue
            signs = (mat @ planes.T) > 0
            bucket = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
            out = pdf.copy()
            out["bucket"] = bucket
            yield out

    fields = ", ".join(
        "%s %s" % (f.name, f.dataType.simpleString())
        for f in vectors.schema.fields
    )
    return vectors.mapInPandas(bucketize, schema=fields + ", bucket long")


def ann_lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN: only vectors in the query's LSH bucket are reranked
    exactly. Recall measured against brute force in pytest."""
    planes = random_hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(((q @ planes.T > 0).astype(np.int64) << np.arange(n_planes)).sum())
    bucketed = with_lsh_bucket(vectors, dim, n_planes, seed, vec_col)
    cands = bucketed.filter(F.col("bucket") == q_bucket)
    return brute_force_topk(cands, query_vec, id_col, vec_col, k)


@register("ann_lsh_bucketed")  # non-SQL: algorithmic; pytest-verified recall
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    out = ann_lsh_topk(emb.filter("vec_id != 0"), qv, dim=len(qv), n_planes=6)
    return out


# ---- IVF (inverted-file) ANN — the other scale path -------------------------


def kmeans_centroids(
    sample: np.ndarray, n_clusters: int, seed: int = 42, n_iter: int = 10
) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample — IVF training.
    At 10^9+ vectors one trains on a ~1M-row sample exactly like this
    (centroid count ~sqrt(n)); the heavy work (assignment) stays
    distributed."""
    rs = np.random.RandomState(seed)
    n = len(sample)
    cent = sample[rs.choice(n, size=min(n_clusters, n), replace=False)].copy()
    for _ in range(n_iter):
        # cosine assignment: normalize then argmax dot
        sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = (sn @ cn.T).argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def with_ivf_cluster(
    vectors: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Nearest-centroid assignment (vectorized matmul per Arrow batch;
    centroids ride the closure — the broadcast-variable pattern)."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    def assign(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = pdf.copy()
            if mat.size == 0:
                out["cluster"] = pd.Series([], dtype="int64")
            else:
                mn = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
                )
                out["cluster"] = (mn @ cn.T).argmax(axis=1).astype(np.int64)
            yield out

    fields = ", ".join(
        "%s %s" % (f.name, f.dataType.simpleString()) for f in vectors.schema.fields
    )
    return vectors.mapInPandas(assign, schema=fields + ", cluster long")


def ann_ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF probe: rerank only the n_probe clusters nearest the query.
    Stored IVF tables partition by cluster so the probe prunes
    partitions (Iceberg partition pruning at scale); here the filter
    prunes after assignment. Recall pytest-verified vs brute force."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()
    clustered = with_ivf_cluster(vectors, centroids, vec_col)
    cands = clustered.filter(F.col("cluster").isin([int(p) for p in probe]))
    return brute_force_topk(cands, query_vec, id_col, vec_col, k)


@register("ann_ivf_probe")  # non-SQL: algorithmic; pytest-verified recall
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    sample = np.array(
        [r["embedding"] for r in emb.limit(256).collect()], dtype=np.float64
    )
    cents = kmeans_centroids(sample, n_clusters=8)
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    return ann_ivf_topk(emb.filter("vec_id != 0"), qv, cents, n_probe=3)
