"""Distributed Lloyd's k-means in exact integer arithmetic.

`ml/similarity.py: kmeans_centroids` trains IVF centroids from a
bounded driver-side sample — the right call for index *training*
(PQ/IVF codebooks are classically trained on samples). This module is
the full-corpus counterpart: every vector participates in every
iteration, so it scales to clustering runs whose ASSIGNMENTS are the
product (SemDeDup cells, corpus bucketing for mixture planning), not
just the codebook. The reference engine (yonasBSD/readur) has no
clustering tier; nearest analogue is its OCR confidence bucketing
(src/ocr/enhanced.rs:1487-1558) — a fixed 1-D quantizer.

Exactness: embeddings are snapped to an integer grid

    val = floor(x * GRID) + OFFSET        (OFFSET makes val >= 0)

float64 widening of the stored float32, one multiply, one floor — each
step identically rounded on every engine. Distances are integer
squared-L2 (differences cancel the OFFSET), the argmin tie-breaks on
the smaller cluster id, and the centroid update is the elementwise
integer mean `sum(val) div count(*)` — non-negative by construction,
so Spark's truncating `div` and DuckDB's flooring `//` agree and the
whole K-iteration trajectory is bit-identical cross-engine (the repo's
no-libm convention; see ml/quality_lm.py, ml/linkgraph.py). Seeds are
the first `k` vector ids — the deterministic stand-in for k-means++
(documented deviation; seeding strategy is orthogonal to the
distributed update this module is about).

State is COLUMNAR — centroids live as (cid, pos, cval) rows, vectors
as (vid, pos, val) rows — because that is the shape that scales:

  - the vector table is posexploded ONCE, hash-partitioned on vid and
    persisted; every iteration reuses that layout;
  - assignment = broadcast join of the K*D centroid rows on `pos`,
    then ONE map-side-combinable (vid, cid) aggregate — N*K*D rows
    stream through partial aggregation, nothing materializes;
  - argmin per vid = min(struct(dist, cid)) — no window, no sort;
  - update = join assignments back on the co-partitioned vid layout,
    then a (cid, pos) aggregate of K*D output rows;
  - per-iteration persist/unpersist truncates lineage (step k never
    replays step k-1), exactly as ml/linkgraph.py's PageRank loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

GRID = 1000
OFFSET = 2 * GRID  # component domain |x| < 2 => val >= 0 always
KM_K = 4
KM_ITERS = 3


def int_components(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, pos, val) integer grid components; pos is 1-based (DuckDB
    UNNEST-WITH-ORDINALITY parity)."""
    return vectors.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("pos0", "x"),
    ).select(
        "vid",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.floor(F.col("x").cast("double") * GRID).cast("long")
            + F.lit(OFFSET)
        ).alias("val"),
    )


def kmeans_lloyd(
    comps: DataFrame, k: int, num_iters: int
) -> tuple[DataFrame, DataFrame]:
    """K-iteration Lloyd fixed point over (vid, pos, val) components.

    Returns (centroids, assignments): centroids as (cid, pos, cval)
    rows on the OFFSET grid, assignments as (vid, cid). Seeds are the
    components of vids 0..k-1. An emptied cluster keeps no rows (its
    id simply stops appearing — mirrored exactly by the oracle)."""
    comps = comps.repartition("vid").persist()
    comps.count()
    cents = (
        comps.filter(F.col("vid") < k)
        .select(
            F.col("vid").alias("cid"), "pos", F.col("val").alias("cval")
        )
        .persist()
    )
    cents.count()
    assign = None
    try:
        for _ in range(num_iters):
            diff = F.col("val") - F.col("cval")
            assign_new = (
                comps.join(F.broadcast(cents), "pos")
                .groupBy("vid", "cid")
                .agg(F.sum(diff * diff).alias("d"))
                .groupBy("vid")
                .agg(F.min(F.struct("d", "cid")).alias("m"))
                .select("vid", F.col("m.cid").alias("cid"))
                .persist()
            )
            assign_new.count()
            if assign is not None:
                assign.unpersist()
            assign = assign_new
            cents_new = (
                comps.join(assign, "vid")
                .groupBy("cid", "pos")
                .agg(F.expr("sum(val) div count(*)").alias("cval"))
                .persist()
            )
            cents_new.count()
            cents.unpersist()
            cents = cents_new
        if assign is None:  # num_iters == 0: seed centroids, no labels
            assign = comps.sparkSession.createDataFrame(
                [], "vid long, cid long"
            )
        return cents, assign
    finally:
        comps.unpersist()


# ---- oracle twin -----------------------------------------------------------


def kmeans_cte_sql(k: int, num_iters: int) -> str:
    """The shared WITH-chain replaying grid snap, seeds, and every
    integer argmin/update through c{num_iters}/a{num_iters} — used by
    this module's oracle and by downstream composers (ml/outliers.py)
    that extend the trajectory with their own CTEs."""
    sql = f"""
    WITH comps AS MATERIALIZED (
      SELECT vec_id AS vid, r.pos AS pos,
             CAST(floor(embedding[r.pos]::DOUBLE * {GRID}) AS BIGINT)
               + {OFFSET} AS val
      FROM embeddings,
           UNNEST(range(1, len(embedding) + 1)) AS r(pos)
    ),
    c0 AS MATERIALIZED (
      SELECT vid AS cid, pos, val AS cval FROM comps WHERE vid < {k}
    )"""
    for i in range(1, num_iters + 1):
        p = i - 1
        sql += f""",
    d{i} AS MATERIALIZED (
      SELECT comps.vid, c.cid,
             CAST(sum((comps.val - c.cval) * (comps.val - c.cval))
                  AS BIGINT) AS d
      FROM comps JOIN c{p} c USING (pos)
      GROUP BY comps.vid, c.cid
    ),
    a{i} AS MATERIALIZED (
      SELECT vid, (min(struct_pack(d := d, cid := cid))).cid AS cid
      FROM d{i} GROUP BY vid
    ),
    c{i} AS MATERIALIZED (
      SELECT a.cid, comps.pos, CAST(sum(comps.val) AS BIGINT)
               // count(*) AS cval
      FROM comps JOIN a{i} a USING (vid)
      GROUP BY a.cid, comps.pos
    )"""
    return sql


def _kmeans_oracle(k: int, num_iters: int) -> str:
    """DuckDB replay: same grid snap, same seeds, same integer
    argmin/update per iteration (materialized CTEs — see ml/bpe.py)."""
    sql = kmeans_cte_sql(k, num_iters)
    last = f"c{num_iters}"
    alast = f"a{num_iters}" if num_iters > 0 else None
    size_join = (
        f"LEFT JOIN (SELECT cid, count(*) AS n FROM {alast} GROUP BY cid) s"
        " USING (cid)"
        if alast
        else "LEFT JOIN (SELECT NULL::BIGINT AS cid, NULL::BIGINT AS n) s"
        " USING (cid)"
    )
    return (
        sql
        + f"""
    SELECT cid, pos, cval, coalesce(s.n, 0) AS cluster_n
    FROM {last} {size_join}
    """
    )


@register("kmeans_centroids_int", oracle=_kmeans_oracle(KM_K, KM_ITERS))
def kmeans_centroids_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus distributed Lloyd's k-means over the embeddings
    table, value-hash-checked: the DuckDB twin replays the grid snap,
    every assignment argmin, and every integer centroid update. Output
    is the final centroid components plus each cluster's size."""
    vectors = load(spark, sf_dir, "embeddings")
    cents, assign = kmeans_lloyd(int_components(vectors), KM_K, KM_ITERS)
    sizes = assign.groupBy("cid").agg(F.count("*").alias("cluster_n"))
    return cents.join(sizes, "cid", "left").select(
        "cid",
        "pos",
        "cval",
        F.coalesce(F.col("cluster_n"), F.lit(0)).alias("cluster_n"),
    )


def kmeans_centroids_full(
    vectors: DataFrame,
    k: int,
    num_iters: int = KM_ITERS,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Full-corpus drop-in for `ml/similarity.py: kmeans_centroids`
    (which trains on a driver-side sample): runs the distributed
    integer Lloyd over EVERY vector and returns the centroids as a
    float ndarray on the original embedding scale — directly usable by
    `with_ivf_cluster` / `build_ivf_index` / `semantic_dedup`. Use when
    cluster quality matters more than training cost (the sample path
    stays the default for codebook training). Only k*d centroid
    components ever reach the driver."""
    import numpy as np

    cents, _ = kmeans_lloyd(
        int_components(vectors, id_col=id_col, vec_col=vec_col),
        k,
        num_iters,
    )
    by_cid: dict[int, dict[int, int]] = {}
    for r in cents.collect():  # bounded: <= k*d rows
        by_cid.setdefault(int(r["cid"]), {})[int(r["pos"])] = int(r["cval"])
    cids = sorted(by_cid)
    dim = max(max(v) for v in by_cid.values())
    out = np.zeros((len(cids), dim), dtype=np.float64)
    for i, cid in enumerate(cids):
        for pos, val in by_cid[cid].items():
            out[i, pos - 1] = (val - OFFSET) / GRID
    return out
