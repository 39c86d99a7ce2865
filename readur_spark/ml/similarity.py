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


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.normal(size=(n_planes, dim)).astype(np.float64)


# Near-dup blocking parameters. The plane matrix is seeded and inlined
# into the DuckDB oracle as literals, so both engines compute the SAME
# buckets — the oracle checks the bucketed semantics, not a relaxation.
_NEARDUP_DIM = 64  # embeddings table dim (TESTDATA.md)
_NEARDUP_PLANES = 6
_NEARDUP_SEED = 42
_NEARDUP_THRESHOLD = 0.3  # max pairwise cosine in the corpus is ~0.51


def _bucket_sql(vec_expr: str, planes) -> str:
    """DuckDB expression for the signed-projection bucket of vec_expr
    under a literal plane matrix (float64, full repr precision — the
    exact doubles numpy uses)."""
    terms = []
    for p, row in enumerate(planes):
        lits = "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"
        terms.append(
            "(CASE WHEN list_dot_product(%s, %s) > 0 THEN %d ELSE 0 END)"
            % (vec_expr, lits, 1 << p)
        )
    return "(" + " + ".join(terms) + ")"


def _neardup_oracle() -> str:
    planes = random_hyperplanes(_NEARDUP_DIM, _NEARDUP_PLANES, _NEARDUP_SEED)
    bucket = _bucket_sql("v", planes)
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), eb AS (
      SELECT vec_id, v, {bucket} AS bucket FROM e
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 3) AS sim
    FROM eb a JOIN eb b ON a.vec_id < b.vec_id AND a.bucket = b.bucket
    WHERE list_cosine_similarity(a.v, b.v) >= {_NEARDUP_THRESHOLD}
    """


@register("embedding_neardup_pairs", oracle=_neardup_oracle())
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection blocked on LSH buckets (the
    scale path: bucket cardinality grows with 2^planes, so per-block
    candidate sets stay bounded at 10^9 vectors — unlike a
    low-cardinality label key, which degenerates to all-pairs per
    label). The oracle recomputes the identical buckets from the same
    literal plane matrix.

    Boundary discipline: bucket ids come back SLIM (id, bucket) from
    the Arrow stage; the embedding payload attaches JVM-side via a key
    join, so no vector ever crosses the Python boundary outbound —
    pinned by a plan test."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ids = lsh_bucket_ids(
        emb, dim=_NEARDUP_DIM, n_planes=_NEARDUP_PLANES, seed=_NEARDUP_SEED,
    )
    bucketed = emb.join(ids, "vec_id")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    sim = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.vec_id") < F.col("b.vec_id"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(sim, 3).alias("sim"),
            sim.alias("_s"),
        )
        .filter(F.col("_s") >= _NEARDUP_THRESHOLD)
        .drop("_s")
    )


@register(
    "ann_multi_query_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 5
    ), s AS (
      SELECT q.q_id, e.vec_id,
             round(list_cosine_similarity(e.v, q.qv), 3) AS sim
      FROM e, q
    ), r AS (
      SELECT q_id, vec_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
      FROM s
    )
    SELECT q_id, vec_id, sim, rn FROM r WHERE rn <= 5
    """,
)
def ann_multi_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN — top-5 per query for a small query BATCH (the
    evaluation-set shape: score k probes against the corpus in ONE
    pass). The query block broadcasts; similarity is a codegen'd
    Catalyst expression; per-query ranking is a window partitioned by
    q_id (shuffle keyed on the small uniform query id). Ranking uses
    the 3-decimal rounded similarity with vec_id tie-break so the
    order is reproducible across engines and float summation orders."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    base = emb.filter(F.col("vec_id") >= 5).select("vec_id", "embedding")
    sim = F.round(cosine(F.col("embedding"), F.col("qv")), 3)
    scored = base.crossJoin(F.broadcast(queries)).select(
        "q_id", "vec_id", sim.alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "vec_id", "sim", "rn")
    )


# ---- LSH-bucketed ANN (scale path) ------------------------------------------


def lsh_bucket_ids(
    vectors: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SLIM bucket assignment: (id, bucket) only. The Arrow boundary
    reads the minimal (id, vector) projection and returns no vector —
    callers that need the embedding back attach it JVM-side (join on
    id, or a broadcast semi-join for small candidate sets) instead of
    shipping the payload through Python twice. Same planes/buckets as
    with_lsh_bucket (pinned by tests)."""
    planes = random_hyperplanes(dim, n_planes, seed)

    def bucketize(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                yield pd.DataFrame({id_col: pdf[id_col], "bucket": pd.Series([], dtype="int64")})
                continue
            signs = (mat @ planes.T) > 0
            bucket = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    slim = vectors.select(id_col, vec_col)
    id_type = slim.schema[id_col].dataType
    return slim.mapInPandas(
        bucketize, schema="%s %s, bucket long" % (id_col, id_type.simpleString())
    )


def lsh_bucket_ids_multi(
    vectors: DataFrame,
    dim: int,
    n_planes: int,
    seed: int,
    n_tables: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SLIM multi-table bucket assignment: (id, buckets array) only —
    the with_lsh_buckets math without the payload crossing back."""
    tables = np.stack(
        [random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )
    flat = tables.reshape(n_tables * n_planes, dim)

    def bucketize(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                yield pd.DataFrame({id_col: pdf[id_col], "buckets": pd.Series([], dtype="object")})
                continue
            signs = (mat @ flat.T > 0).reshape(len(mat), n_tables, n_planes)
            b = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=2)
            yield pd.DataFrame({id_col: pdf[id_col], "buckets": list(b)})

    slim = vectors.select(id_col, vec_col)
    id_type = slim.schema[id_col].dataType
    return slim.mapInPandas(
        bucketize,
        schema="%s %s, buckets array<long>" % (id_col, id_type.simpleString()),
    )


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


def with_lsh_buckets(
    vectors: DataFrame,
    dim: int,
    n_planes: int,
    seed: int,
    n_tables: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """n_tables independent signed-projection buckets per vector (one
    `buckets` array column), computed in a single vectorized matmul per
    Arrow batch — the multi-table LSH recall knob: candidate recall
    rises with table count while each table's bucket join stays
    uniform."""
    tables = np.stack(
        [random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    )  # (T, P, dim)
    flat = tables.reshape(n_tables * n_planes, dim)

    def bucketize(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = pdf.copy()
            if mat.size == 0:
                out["buckets"] = pd.Series([], dtype="object")
            else:
                signs = (mat @ flat.T > 0).reshape(len(mat), n_tables, n_planes)
                b = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=2)
                out["buckets"] = list(b)
            yield out

    fields = ", ".join(
        "%s %s" % (f.name, f.dataType.simpleString()) for f in vectors.schema.fields
    )
    return vectors.mapInPandas(bucketize, schema=fields + ", buckets array<long>")


def ann_lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """ANN: only vectors sharing the query's bucket in ≥1 of n_tables
    LSH tables are reranked exactly. Recall is tuned by (n_planes down,
    n_tables up); measured against brute force in pytest
    (tests/test_lsh_recall.py).

    Boundary discipline: the Arrow stage emits only (id, buckets); the
    bucket filter reduces to a small candidate id set, and the rerank
    attaches embeddings JVM-side with a broadcast semi-join — the
    payload never crosses the Python boundary outbound, and only
    candidate vectors are ever scored."""
    q = np.asarray(query_vec, dtype=np.float64)
    q_buckets = []
    for t in range(n_tables):
        planes = random_hyperplanes(dim, n_planes, seed + t)
        q_buckets.append(
            int(((q @ planes.T > 0).astype(np.int64) << np.arange(n_planes)).sum())
        )
    ids = lsh_bucket_ids_multi(
        vectors, dim, n_planes, seed, n_tables, id_col=id_col, vec_col=vec_col
    )
    cond = None
    for t, qb in enumerate(q_buckets):
        c = F.element_at(F.col("buckets"), t + 1) == qb
        cond = c if cond is None else (cond | c)
    cand_ids = ids.filter(cond).select(id_col)
    cands = vectors.join(F.broadcast(cand_ids), id_col, "left_semi")
    return brute_force_topk(cands, query_vec, id_col, vec_col, k)


_ANN_LSH_PLANES = 6
_ANN_LSH_TABLES = 4
_ANN_LSH_SEED = 42


def _ann_lsh_oracle() -> str:
    """The multi-table bucket filter + exact rerank, re-expressed in
    DuckDB over the same literal plane matrices (so the oracle checks
    the bucketed candidate semantics, not just 'some top-10')."""
    conds = []
    for t in range(_ANN_LSH_TABLES):
        planes = random_hyperplanes(_NEARDUP_DIM, _ANN_LSH_PLANES, _ANN_LSH_SEED + t)
        conds.append(
            "%s = %s" % (_bucket_sql("e.v", planes), _bucket_sql("q.qv", planes))
        )
    any_table = " OR ".join(conds)
    return f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0
    )
    SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 3) AS sim
    FROM e, q
    WHERE {any_table}
    ORDER BY round(list_cosine_similarity(e.v, q.qv), 3) DESC, e.vec_id
    LIMIT 10
    """


@register("ann_lsh_bucketed", oracle=_ann_lsh_oracle())
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    return ann_lsh_topk(
        emb.filter("vec_id != 0").select("vec_id", "embedding"),
        qv, dim=len(qv),
        n_planes=_ANN_LSH_PLANES, seed=_ANN_LSH_SEED, n_tables=_ANN_LSH_TABLES,
    )


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


def ivf_cluster_ids(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SLIM nearest-centroid assignment: (id, cluster) only. The Arrow
    boundary reads the minimal (id, vector) projection and emits no
    vector back; the index builder re-attaches the payload JVM-side.
    The row vector is NOT normalized before the argmax — cosine argmax
    is invariant to the (positive) row norm, which both cuts flops and
    makes the assignment exactly `argmax_c v·ĉ_c`, the form the DuckDB
    oracle replays over literal centroids."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    def assign(batches):
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "cluster": pd.Series([], dtype="int64")}
                )
                continue
            cluster = (mat @ cn.T).argmax(axis=1).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "cluster": cluster})

    slim = vectors.select(id_col, vec_col)
    id_type = slim.schema[id_col].dataType
    return slim.mapInPandas(
        assign, schema="%s %s, cluster long" % (id_col, id_type.simpleString())
    )


class IvfIndex:
    """A MATERIALIZED IVF layout: data parquet partitioned by cluster
    (+ stored int8 codes) and a meta.json carrying the centroids and
    quantization scale — the corpus statistics a query needs without
    touching the data.

    This is the fix for the round-2 scale finding: the query path used
    to re-assign the WHOLE corpus per query (a full mapInPandas matmul)
    and then filter to the probed clusters. Now assignment happens ONCE
    at build time; a query is a partition-pruned scan of n_probe
    cluster directories + exact rerank — no Python stage at query time
    (plan-pinned). On a cluster the layout is an Iceberg table
    partitioned by `cluster` and meta.json is table properties."""

    def __init__(self, root: str):
        import json
        import os

        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        self.centroids = np.array(meta["centroids"], dtype=np.float64)
        self.scale = float(meta["scale"])
        self.id_col = meta["id_col"]
        self.vec_col = meta["vec_col"]

    @property
    def data_path(self) -> str:
        import os

        return os.path.join(self.root, "data")

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.data_path)


def build_ivf_index(
    vectors: DataFrame,
    centroids: np.ndarray,
    root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float | None = None,
) -> IvfIndex:
    """Build the stored IVF layout: one slim assignment pass (the only
    Python stage in the index lifecycle), JVM-side payload re-attach,
    int8 codes as a Catalyst projection, partitioned write, then an
    atomic meta.json publication (SnapshotStore's rename pattern)."""
    import json
    import os

    slim = vectors.select(id_col, vec_col)
    ids = ivf_cluster_ids(slim, centroids, id_col=id_col, vec_col=vec_col)
    if scale is None:
        scale = quantization_scale(slim, vec_col)
    data = (
        slim.join(ids, id_col)
        .withColumn("code", quantize_vector(F.col(vec_col), scale))
    )
    data.write.partitionBy("cluster").mode("overwrite").parquet(
        os.path.join(root, "data")
    )
    meta = {
        "centroids": [[float(x) for x in row] for row in centroids],
        "scale": float(scale),
        "dim": int(centroids.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    tmp = os.path.join(root, ".meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "meta.json"))
    return IvfIndex(root)


def ivf_probe_clusters(
    centroids: np.ndarray, query_vec: list[float], n_probe: int
) -> list[int]:
    """The n_probe clusters nearest the query (cosine) — a driver-side
    computation over the index's stored centroid statistics."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    return [int(c) for c in np.argsort(-(cn @ qn))[:n_probe]]


def ann_ivf_index_topk(
    spark: SparkSession,
    index: IvfIndex,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Query the stored IVF layout: partition-pruned scan of the probed
    cluster directories + exact cosine rerank. No Python stage, no
    full-corpus touch — the scan reads n_probe/n_clusters of the data
    (Iceberg partition pruning at scale; parquet directory pruning
    here, pinned by an inputFiles test)."""
    probe = ivf_probe_clusters(index.centroids, query_vec, n_probe)
    cands = index.read(spark).filter(F.col("cluster").isin(probe))
    return brute_force_topk(cands, query_vec, index.id_col, index.vec_col, k)


def ann_ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """Index-FREE IVF probe (assignment inline): the one-shot
    formulation for ad-hoc exploration where no stored layout exists.
    Production queries go through build_ivf_index + ann_ivf_index_topk
    — this inline form re-assigns the corpus per call and exists as the
    semantic reference the index path is pinned against in pytest."""
    probe = ivf_probe_clusters(centroids, query_vec, n_probe)
    clustered = with_ivf_cluster(vectors, centroids, vec_col)
    cands = clustered.filter(F.col("cluster").isin(probe))
    return brute_force_topk(cands, query_vec, id_col, vec_col, k)


# Registered-query index parameters: centroids are SEEDED RANDOM
# directions, not k-means-trained — the correctness surface needs a
# deterministic, literal-embeddable partition of the space (the same
# trick as the LSH plane oracles); centroid QUALITY only moves recall,
# which the k-means path covers in pytest (test_ann_ivf.py).
_IVF_DIM = 64
_IVF_CLUSTERS = 8
_IVF_SEED = 7
_IVF_PROBE = 3

_IVF_INDEX_CACHE: dict[str, str] = {}


def _ivf_index_for(spark: SparkSession, sf_dir: str) -> IvfIndex:
    """Build (once per process per sf_dir) the materialized index the
    registered queries scan. The driver contract is stateless, so the
    build rides the first query call; a real deployment builds the
    index as its own job and queries it forever."""
    import os
    import tempfile

    root = _IVF_INDEX_CACHE.get(sf_dir)
    if root is None or not os.path.isfile(os.path.join(root, "meta.json")):
        root = tempfile.mkdtemp(prefix="readur_ivf_")
        emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        cents = random_hyperplanes(_IVF_DIM, _IVF_CLUSTERS, _IVF_SEED)
        build_ivf_index(emb, cents, root)
        _IVF_INDEX_CACHE[sf_dir] = root
    return IvfIndex(root)


def _ivf_probe_oracle() -> str:
    """DuckDB replay of the materialized-IVF probe over LITERAL
    centroids: per-vector cluster = argmax of the centroid dots (first
    max, like numpy argmax via list_position), probed set = clusters
    whose query-dot clears the n_probe-th largest, then exact cosine
    top-10 inside the probed slice."""
    cents = random_hyperplanes(_IVF_DIM, _IVF_CLUSTERS, _IVF_SEED)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    def dots(expr: str) -> str:
        terms = []
        for row in cn:
            lits = "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"
            terms.append("list_dot_product(%s, %s)" % (expr, lits))
        return "[" + ", ".join(terms) + "]"

    return f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), qd AS (
      SELECT qv, {dots("qv")} AS qds FROM q
    ), probe AS (
      SELECT qv, qds, list_sort(qds, 'DESC')[{_IVF_PROBE}] AS cut FROM qd
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> 0
    ), ed AS (
      SELECT vec_id, v, {dots("v")} AS ds FROM e
    ), ec AS (
      SELECT vec_id, v, list_position(ds, list_max(ds)) AS cl1 FROM ed
    )
    SELECT ec.vec_id, round(list_cosine_similarity(ec.v, probe.qv), 3) AS sim
    FROM ec, probe
    WHERE probe.qds[ec.cl1] >= probe.cut
    ORDER BY round(list_cosine_similarity(ec.v, probe.qv), 3) DESC, ec.vec_id
    LIMIT 10
    """


@register("ann_ivf_probe", oracle=_ivf_probe_oracle())
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF query against the MATERIALIZED index (build amortized across
    calls): partition-pruned scan of the probed clusters + exact
    rerank. Oracle replays cluster assignment and probing from the same
    literal centroid matrix, so the bucketed-candidate semantics are
    value-hash-checked — upgraded from rows-only in round 2."""
    index = _ivf_index_for(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    probe = ivf_probe_clusters(index.centroids, qv, _IVF_PROBE)
    cands = (
        index.read(spark)
        .filter(F.col("cluster").isin(probe))
        .filter(F.col("vec_id") != 0)
    )
    return brute_force_topk(cands, qv, index.id_col, index.vec_col, 10)


# ---------------------------------------------------------------------------
# Scalar-quantized ANN (the memory-scale path)
# ---------------------------------------------------------------------------

def quantization_scale(
    vectors: DataFrame, vec_col: str = "embedding"
) -> float:
    """Global max |component| over L2-normalized vectors — ONE scalar
    of corpus statistics (a bounded driver value, like the IVF
    centroid sample). A single symmetric scale is what keeps the
    quantized dot product proportional to the true dot product;
    per-dimension affine ranges would add candidate-dependent shift
    terms that scramble the ranking."""
    norm = F.greatest(
        F.sqrt(
            F.aggregate(
                F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
        F.lit(1e-12),  # all-zero vectors contribute 0, not NaN
    )
    row = vectors.select(
        F.max(
            F.array_max(
                F.transform(F.col(vec_col), lambda x: F.abs(x / norm))
            )
        ).alias("s")
    ).first()
    # empty input → s is None; degenerate (≤0 / None) → identity scale
    return float(row["s"]) if row["s"] else 1.0


def quantize_vector(vec, scale: float):
    """int8-range symmetric quantization of an L2-normalized vector:
    q[i] = round(127·v[i]/(‖v‖·scale)). The encoded array is 4× smaller
    than float32 (8× smaller than the float64 the table carries) — the
    difference between an embedding corpus that fits executor memory
    and one that doesn't. Σ q·p ∝ cosine(v, u) up to rounding, so the
    candidate stage ranks by (integer) cosine."""
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.transform(
        vec, lambda x: F.round(x / norm / scale * 127.0).cast("int")
    )


def ann_quantized_topk(
    vectors: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank_factor: int = 4,
    scale: float | None = None,
) -> DataFrame:
    """Two-stage ANN: integer dot product over int8 codes of
    L2-normalized vectors selects k·rerank_factor candidates, exact
    float cosine reranks to the final k. At 10^9+ vectors the first
    stage scans 1/8th the bytes of the float corpus; the rerank touches
    only the candidate slice. Recall loss comes solely from rounding in
    the candidate stage — pinned ≥ 0.9 vs brute force in pytest."""
    import math

    if scale is None:
        scale = quantization_scale(vectors, vec_col)
    codes = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        quantize_vector(F.col(vec_col), scale).alias("code"),
    )
    return _quantized_rank_rerank(
        codes, query_vec, scale,
        id_col=id_col, vec_col=vec_col, k=k, rerank_factor=rerank_factor,
    )


def _quantized_rank_rerank(
    codes: DataFrame,
    query_vec: list[float],
    scale: float,
    *,
    id_col: str,
    vec_col: str,
    k: int,
    rerank_factor: int,
) -> DataFrame:
    """The shared two-stage ranking over a frame that already carries
    int8 `code`s (computed inline, or read back from a stored IVF
    layout): integer dot-product candidate scan → exact cosine rerank."""
    import math

    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    q_query = [int(round(x / qn / scale * 127.0)) for x in query_vec]
    qq = F.array(*[F.lit(int(x)) for x in q_query])
    int_dot = F.aggregate(
        F.zip_with(F.col("code"), qq, lambda a, b: (a * b).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    candidates = (
        codes.withColumn("qscore", int_dot)
        .orderBy(F.desc("qscore"), F.asc(id_col))
        .limit(k * rerank_factor)
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), qv)
    return (
        candidates.select(id_col, F.round(sim, 3).alias("sim"), sim.alias("_s"))
        .orderBy(F.desc("_s"), F.asc(id_col))
        .limit(k)
        .drop("_s")
    )


@register("ann_quantized_topk")
def ann_quantized_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uint8-quantized candidate scan + exact rerank for query vec_id 0
    (rows-only driver check; recall vs brute force pinned in pytest —
    quantization ranges are corpus statistics, not SQL)."""
    emb = load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    rest = emb.filter(F.col("vec_id") != 0)
    return ann_quantized_topk(rest, list(query))


def ann_ivf_quantized_topk(
    vectors: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
    rerank_factor: int = 4,
    scale: float | None = None,
) -> DataFrame:
    """The production composition (IVF-PQ shape): IVF probe prunes to
    the clusters nearest the query, the int8 integer-dot stage ranks
    candidates inside the probed slice, exact cosine reranks the final
    k. At 10^9+ vectors the scan touches n_probe/n_clusters of the
    corpus at 1/8th the bytes — the two prunings multiply."""
    probe = ivf_probe_clusters(centroids, query_vec, n_probe)
    clustered = with_ivf_cluster(vectors, centroids, vec_col)
    cands = clustered.filter(F.col("cluster").isin(probe))
    return ann_quantized_topk(
        cands, query_vec, id_col=id_col, vec_col=vec_col, k=k,
        rerank_factor=rerank_factor, scale=scale,
    )


def ann_ivf_index_quantized_topk(
    spark: SparkSession,
    index: IvfIndex,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    rerank_factor: int = 4,
) -> DataFrame:
    """The production IVF-PQ-shaped query over the MATERIALIZED layout:
    partition-pruned scan of probed clusters reading the STORED int8
    codes (no re-quantization pass), integer candidate ranking, exact
    rerank of the final slice. Scan bytes: n_probe/n_clusters of the
    corpus at 1/8th width — both prunings multiply, and no Python stage
    exists at query time."""
    probe = ivf_probe_clusters(index.centroids, query_vec, n_probe)
    cands = index.read(spark).filter(F.col("cluster").isin(probe))
    return _quantized_rank_rerank(
        cands, query_vec, index.scale,
        id_col=index.id_col, vec_col=index.vec_col,
        k=k, rerank_factor=rerank_factor,
    )


@register("ann_ivf_quantized")  # non-SQL: int8 rounding is not portably
def ann_ivf_quantized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×int8 against the materialized index (stored codes; rows-only
    driver check — float→int8 rounding isn't portably SQL-expressible;
    recall + full-probe≡brute-force pinned in pytest)."""
    index = _ivf_index_for(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow["embedding"]]
    probe = ivf_probe_clusters(index.centroids, qv, _IVF_PROBE)
    cands = (
        index.read(spark)
        .filter(F.col("cluster").isin(probe))
        .filter(F.col("vec_id") != 0)
    )
    return _quantized_rank_rerank(
        cands, qv, index.scale,
        id_col=index.id_col, vec_col=index.vec_col, k=10, rerank_factor=4,
    )


# ---- LSH recall observable (r5s11) -----------------------------------------
#
# tests/test_lsh_recall.py pins recall ≥ 0.9 as a bound; this query
# makes the recall MEASUREMENT itself a value-hashed artifact: per
# anchor, the bucketed candidate top-k is compared against brute-force
# ground truth and the per-anchor hit count is published. The DuckDB
# twin recomputes every bucket (literal plane matrices), both top-k
# rankings, and the intersection — so the driver row certifies the
# exact recall number, not just "above a bound".

_RECALL_MOD = 100   # vec_id % 100 == 0 → the anchor sample
_RECALL_K = 10


def lsh_recall_table(
    vectors: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = _RECALL_K,
    n_planes: int = _ANN_LSH_PLANES,
    seed: int = _ANN_LSH_SEED,
    n_tables: int = _ANN_LSH_TABLES,
    anchor_mod: int = _RECALL_MOD,
) -> DataFrame:
    """(anchor_id, n_brute, n_lsh, hits, recall_permille) per anchor.
    One Arrow pass computes every vector's bucket array (queries
    included); candidates are bucket-collision pairs; both rankings
    are windows over the slim (anchor, cand, sim) frame."""
    from pyspark.sql import Window

    buckets = lsh_bucket_ids_multi(
        vectors, dim, n_planes, seed, n_tables,
        id_col=id_col, vec_col=vec_col,
    )
    anchors = (
        vectors.filter(F.col(id_col) % anchor_mod == 0)
        .select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("av"),
        )
        .join(
            buckets.select(
                F.col(id_col).alias("anchor_id"),
                F.col("buckets").alias("abuckets"),
            ),
            "anchor_id",
        )
    )
    scored = (
        vectors.join(buckets, id_col)
        .crossJoin(F.broadcast(anchors))
        .filter(F.col(id_col) != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.col(id_col).alias("cand_id"),
            cosine(F.col(vec_col), F.col("av")).alias("_s"),
            F.expr(
                "exists(zip_with(buckets, abuckets, (a, b) -> a = b), "
                "x -> x)"
            ).alias("_hit_bucket"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("_s"), F.asc("cand_id")
    )
    brute = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("anchor_id", "cand_id")
    )
    lsh = (
        scored.filter(F.col("_hit_bucket"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("anchor_id", F.col("cand_id").alias("lsh_id"))
    )
    hits = (
        brute.join(
            lsh,
            (brute["anchor_id"] == lsh["anchor_id"])
            & (brute["cand_id"] == lsh["lsh_id"]),
            "left",
        )
        .groupBy(brute["anchor_id"].alias("anchor_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_brute"),
            F.sum(F.when(F.col("lsh_id").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("hits"),
        )
    )
    n_lsh = lsh.groupBy("anchor_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lsh")
    )
    return hits.join(n_lsh, "anchor_id", "left").select(
        "anchor_id",
        "n_brute",
        F.coalesce(F.col("n_lsh"), F.lit(0).cast("long")).alias("n_lsh"),
        "hits",
        F.expr("(1000L * hits) div n_brute").alias("recall_permille"),
    )


def _lsh_recall_oracle() -> str:
    conds = []
    for t in range(_ANN_LSH_TABLES):
        planes = random_hyperplanes(
            _NEARDUP_DIM, _ANN_LSH_PLANES, _ANN_LSH_SEED + t
        )
        conds.append(
            "%s = %s"
            % (_bucket_sql("e.v", planes), _bucket_sql("a.av", planes))
        )
    any_table = " OR ".join(conds)
    return f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av
      FROM embeddings WHERE vec_id % {_RECALL_MOD} = 0
    ), e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), scored AS (
      SELECT a.anchor_id, e.vec_id AS cand_id,
             list_cosine_similarity(e.v, a.av) AS s,
             ({any_table}) AS hit_bucket
      FROM e CROSS JOIN a
      WHERE e.vec_id <> a.anchor_id
    ), brute AS (
      SELECT anchor_id, cand_id FROM (
        SELECT anchor_id, cand_id,
               row_number() OVER (PARTITION BY anchor_id
                                  ORDER BY s DESC, cand_id) AS rk
        FROM scored
      ) WHERE rk <= {_RECALL_K}
    ), lsh AS (
      SELECT anchor_id, cand_id FROM (
        SELECT anchor_id, cand_id,
               row_number() OVER (PARTITION BY anchor_id
                                  ORDER BY s DESC, cand_id) AS rk
        FROM scored WHERE hit_bucket
      ) WHERE rk <= {_RECALL_K}
    ), h AS (
      SELECT b.anchor_id,
             CAST(count(*) AS BIGINT) AS n_brute,
             CAST(sum(CASE WHEN l.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits
      FROM brute b LEFT JOIN lsh l
        ON b.anchor_id = l.anchor_id AND b.cand_id = l.cand_id
      GROUP BY b.anchor_id
    ), nl AS (
      SELECT anchor_id, CAST(count(*) AS BIGINT) AS n_lsh
      FROM lsh GROUP BY anchor_id
    )
    SELECT h.anchor_id, h.n_brute,
           coalesce(nl.n_lsh, 0) AS n_lsh, h.hits,
           CAST((1000 * h.hits) // h.n_brute AS BIGINT)
             AS recall_permille
    FROM h LEFT JOIN nl USING (anchor_id)
    """


@register("ann_lsh_recall", oracle=_lsh_recall_oracle())
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor LSH recall@10 vs brute force, value-hashed: DuckDB
    recomputes every bucket from the literal plane matrices, both
    rankings, and the intersection counts.

    Fixture note: the synthetic embeddings are ISOTROPIC noise — the
    worst case for LSH, where a "nearest" neighbor sits near 90° and
    the collision probability is the baseline (1 − θ/π)^p per table
    (~3 % at p=6, ×4 tables ≈ 11 %) — so single-digit recall here is
    the correct measurement, not a bug. On clustered data the same
    pipeline reads recall ≈ 1000‰ (pinned in
    tests/test_similarity_recall.py::TestLshRecallTable), and
    tests/test_lsh_recall.py holds the ≥ 0.9 bound on the clustered
    fixture. The value of THIS query is that the driver artifact
    carries the exact recall measurement machinery end-to-end."""
    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    return lsh_recall_table(emb, dim=dim)
