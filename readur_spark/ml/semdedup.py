"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication" — public literature).

The recipe: cluster the embedding space (k-means / IVF cells), then
WITHIN each cluster find pairs above a cosine threshold ε, group them,
and keep exactly one representative per duplicate group — the paper
keeps the member with the LOWEST cosine similarity to its cluster
centroid (the "far from centroid" rule: it preserves the cluster's
diversity rather than its mode). Cluster-blocking is the approximation
that makes the operator feasible at web scale: candidate generation is
per-cell all-pairs, never corpus all-pairs.

Spark shape (scale notes):
  - assignment is the IVF machinery's one slim Arrow stage
    (`ivf_cluster_ids` — (id, cluster) out, no vectors returned);
    at 10^9+ vectors this is the stored IVF index's build-time
    assignment, reused for free
  - pairs are a JVM-side self-join keyed on `cluster` with a codegen
    cosine — per-cell cardinality is corpus/n_clusters, so the join
    fanout is bounded by cell size, exactly like
    `embedding_neardup_pairs`'s LSH blocks
  - duplicate groups reuse `ml/components.connected_components`
    (slim min-label propagation, payloads never shuffled)
  - the keep rule is one window over the slim (vec_id, comp, csim)
    frame

Oracle: the DuckDB replay assigns clusters from the same LITERAL
centroid matrix (the deterministic-partition trick every LSH/IVF
oracle here uses), re-derives components with a recursive-CTE
transitive closure, and applies the identical keep window — the whole
operator is value-hash-checked end-to-end, including the keep flags.

Reference tie-in: the reference's dedup tier stops at exact sha256
groups (src/services/file_service.rs hash dedup); semantic dedup is
part of the beyond-reference LLM-training-data tier this engine adds
(SURVEY.md §6).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from readur_spark.ml.components import connected_components
from readur_spark.ml.similarity import (
    cosine,
    ivf_cluster_ids,
    random_hyperplanes,
)
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

_SD_DIM = 64       # embeddings table dim (TESTDATA.md)
_SD_CLUSTERS = 8
_SD_SEED = 11      # distinct from the IVF/LSH oracle seeds
_SD_EPS = 0.3      # corpus max pairwise cosine ≈ 0.51 (see similarity)


def semantic_dedup(
    emb: DataFrame,
    centroids: np.ndarray,
    eps: float = _SD_EPS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, comp, sim_to_centroid, keep) for every vector:
    cluster-blocked cosine pairs ≥ eps → duplicate components → keep
    the component member least similar to its cluster centroid
    (SemDeDup's diversity rule), ties to the lower id."""
    spark = emb.sparkSession
    slim = emb.select(id_col, vec_col)
    assigned = slim.join(ivf_cluster_ids(slim, centroids, id_col=id_col,
                                         vec_col=vec_col), id_col)

    # centroid payloads as a tiny broadcast dim table (n_clusters rows)
    cent_rows = [(i, [float(x) for x in row]) for i, row in enumerate(centroids)]
    cents = spark.createDataFrame(cent_rows, "cluster int, centroid array<double>")
    with_sim = assigned.join(F.broadcast(cents), "cluster").withColumn(
        "csim", cosine(F.col(vec_col), F.col("centroid"))
    ).drop("centroid")

    a, b = with_sim.alias("a"), with_sim.alias("b")
    pair_sim = cosine(F.col("a." + vec_col), F.col("b." + vec_col))
    pairs = (
        a.join(
            b,
            (F.col("a." + id_col) < F.col("b." + id_col))
            & (F.col("a.cluster") == F.col("b.cluster")),
        )
        .filter(pair_sim >= eps)
        .select(
            F.col("a." + id_col).alias("id_a"),
            F.col("b." + id_col).alias("id_b"),
        )
    )

    comps = connected_components(pairs)  # (id, comp), paired nodes only
    out = (
        with_sim.select(id_col, "cluster", "csim")
        .join(comps.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("comp", F.coalesce("comp", F.col(id_col)))
    )
    w = Window.partitionBy("comp").orderBy(F.col("csim").asc(), F.col(id_col).asc())
    return out.withColumn("keep", F.row_number().over(w) == 1)


def _centroid_case_sql(cents: np.ndarray) -> str:
    """CASE selecting the literal raw-centroid list for a 1-based
    cluster position."""
    arms = []
    for i, row in enumerate(cents):
        lits = "[" + ", ".join(repr(float(x)) for x in row) + "]::DOUBLE[]"
        arms.append("WHEN %d THEN %s" % (i + 1, lits))
    return "CASE cl1 " + " ".join(arms) + " END"


def _semdedup_oracle() -> str:
    cents = random_hyperplanes(_SD_DIM, _SD_CLUSTERS, _SD_SEED)
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    dots = "[" + ", ".join(
        "list_dot_product(v, [" + ", ".join(repr(float(x)) for x in row)
        + "]::DOUBLE[])"
        for row in cn
    ) + "]"
    return f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), ed AS (
      SELECT vec_id, v, {dots} AS ds FROM e
    ), ec AS (
      SELECT vec_id, v, list_position(ds, list_max(ds)) AS cl1 FROM ed
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM ec a JOIN ec b ON a.vec_id < b.vec_id AND a.cl1 = b.cl1
      WHERE list_cosine_similarity(a.v, b.v) >= {_SD_EPS}
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT g.b, r.comp FROM reach r JOIN edges g ON g.a = r.id
      WHERE r.comp < g.b
    ), comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
    fl AS (
      SELECT ec.vec_id,
             CAST(ec.cl1 - 1 AS INT) AS cluster,
             coalesce(c.comp, ec.vec_id) AS comp,
             list_cosine_similarity(ec.v, {_centroid_case_sql(cents)}) AS csim
      FROM ec LEFT JOIN comps c ON c.id = ec.vec_id
    )
    SELECT vec_id, cluster, comp,
           round(csim, 3) AS sim_to_centroid,
           (row_number() OVER (PARTITION BY comp ORDER BY csim, vec_id) = 1)
             AS keep
    FROM fl
    """


@register("semantic_dedup_keep", oracle=_semdedup_oracle())
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: every vector with its
    cluster, duplicate-component id, centroid similarity, and the keep
    flag (one survivor per component, lowest-centroid-sim rule). The
    oracle replays assignment, components, and the keep window from
    the same literal centroids — keep decisions are value-hashed."""
    cents = random_hyperplanes(_SD_DIM, _SD_CLUSTERS, _SD_SEED)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    res = semantic_dedup(emb, cents)
    return res.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        "comp",
        F.round("csim", 3).alias("sim_to_centroid"),
        "keep",
    )
