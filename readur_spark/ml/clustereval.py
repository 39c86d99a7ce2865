"""Clustering evaluation — exact-integer Adjusted Rand Index + purity.

The engine's clustering tier (ml/kmeans.py integer Lloyd, ml/semdedup.py
IVF cells) feeds curation decisions; this module is its evaluation
harness, the clustering twin of ml/ranking_eval.py's nDCG/MRR: compare
a predicted assignment against ground-truth labels with the Adjusted
Rand Index (Hubert & Arabie 1985, the chance-corrected pair-counting
agreement) and per-cluster majority purity.

ARI in exact integers (no floats, so the DuckDB twin value-hashes it):
with contingency counts n_ij, cluster sizes a_i, label sizes b_j,
n total, and P(x) = x(x-1)/2 (pair counts — always non-negative, so
floor `//` == truncating `div`):

    Snij = Σ P(n_ij),  Sa = Σ P(a_i),  Sb = Σ P(b_j),  C2n = P(n)
    ARI  = (C2n·Snij - Sa·Sb) / (C2n·(Sa+Sb)/2 - Sa·Sb)

multiplied through by 2 to stay integral, reported in milli-units via
the sign-abs division idiom (ml/abtt.py — ARI is negative for
worse-than-chance assignments, and Spark `div` vs DuckDB `//` differ
on negatives unless routed through |·|). The degenerate
single-cluster-single-label case (denominator 0) reports 0.

Scale design: the contingency table is one map-side-combinable agg of
the slim (vid, cid, label) frame — k·L rows out; every later step runs
on that bounded frame. The C2n·Snij product grows as n², so at
corpus scale (>~10^9 rows) the evaluation runs on a held-out slice —
compose with ml/evalset.py's stratified eval set, which is exactly
what a clustering-quality gate should measure anyway; the pipeline
never needs corpus-wide ARI.

Reference tie-in: the reference engine reports per-label document
counts for its label model (SURVEY.md §2 B18); this is the
agreement-with-ground-truth version the clustering tier needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.abtt import _sdiv_duck, _sdiv_sql
from readur_spark.ml.kmeans import (
    KM_ITERS,
    KM_K,
    int_components,
    kmeans_cte_sql,
    kmeans_lloyd,
)
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def contingency(
    assign: DataFrame, labels: DataFrame, *,
    id_col: str = "vid", pred_col: str = "cid", label_col: str = "label",
) -> DataFrame:
    """(cid, label, nij) — one combinable agg over the slim join."""
    return (
        assign.join(labels, id_col)
        .groupBy(pred_col, label_col)
        .agg(F.count("*").cast("long").alias("nij"))
    )


def ari_milli(ct: DataFrame) -> DataFrame:
    """One row (n_pairs_total, sum_pairs_within, sum_pairs_pred,
    sum_pairs_true, ari_milli) from a contingency frame."""
    pairs = "x * (x - 1) div 2"
    snij = ct.select(
        F.expr(pairs.replace("x", "nij")).alias("v")
    ).agg(F.sum("v").alias("snij"))
    arow = ct.groupBy("cid").agg(F.sum("nij").alias("ai"))
    sa = arow.agg(F.sum(F.expr(pairs.replace("x", "ai"))).alias("sa"))
    brow = ct.groupBy("label").agg(F.sum("nij").alias("bj"))
    sb = brow.agg(F.sum(F.expr(pairs.replace("x", "bj"))).alias("sb"))
    c2n = ct.agg(F.sum("nij").alias("n")).select(
        F.expr("n * (n - 1) div 2").alias("c2n")
    )
    one = (
        snij.crossJoin(sa).crossJoin(sb).crossJoin(c2n)
    )
    den = "c2n * (sa + sb) - 2 * sa * sb"
    num = "2 * (c2n * snij - sa * sb)"
    return one.select(
        F.col("c2n").cast("long").alias("n_pairs_total"),
        F.col("snij").cast("long").alias("sum_pairs_within"),
        F.col("sa").cast("long").alias("sum_pairs_pred"),
        F.col("sb").cast("long").alias("sum_pairs_true"),
        F.expr(
            f"CASE WHEN {den} = 0 THEN 0 ELSE "
            + _sdiv_sql(f"1000 * ({num})", f"({den})")
            + " END"
        ).cast("long").alias("ari_milli"),
    )


def cluster_purity(ct: DataFrame) -> DataFrame:
    """(cid, size, majority_label, purity_milli) — majority label per
    predicted cluster (ties to the smaller label, a deterministic
    total order both engines share)."""
    return ct.groupBy("cid").agg(
        F.sum("nij").cast("long").alias("size"),
        F.min(F.struct((-F.col("nij")).alias("a"),
                       F.col("label").alias("l"))).alias("m"),
    ).select(
        "cid", "size",
        F.col("m.l").cast("long").alias("majority_label"),
        F.expr("(1000L * (-m.a)) div size").alias("purity_milli"),
    )


_CT_CTE = kmeans_cte_sql(KM_K, KM_ITERS) + f""",
    ct AS MATERIALIZED (
      SELECT a.cid, CAST(e.label AS BIGINT) AS label, count(*) AS nij
      FROM a{KM_ITERS} a JOIN embeddings e ON a.vid = e.vec_id
      GROUP BY a.cid, e.label
    )"""


_ARI_ORACLE = _CT_CTE + f""",
    sc AS (
      SELECT (SELECT sum(nij * (nij - 1) // 2) FROM ct) AS snij,
             (SELECT sum(ai * (ai - 1) // 2) FROM
               (SELECT sum(nij) AS ai FROM ct GROUP BY cid)) AS sa,
             (SELECT sum(bj * (bj - 1) // 2) FROM
               (SELECT sum(nij) AS bj FROM ct GROUP BY label)) AS sb,
             (SELECT n * (n - 1) // 2 FROM
               (SELECT sum(nij) AS n FROM ct)) AS c2n
    )
    SELECT CAST(c2n AS BIGINT) AS n_pairs_total,
           CAST(snij AS BIGINT) AS sum_pairs_within,
           CAST(sa AS BIGINT) AS sum_pairs_pred,
           CAST(sb AS BIGINT) AS sum_pairs_true,
           CAST(CASE WHEN c2n * (sa + sb) - 2 * sa * sb = 0 THEN 0 ELSE
             {_sdiv_duck("1000 * (2 * (c2n * snij - sa * sb))",
                         "(c2n * (sa + sb) - 2 * sa * sb)")}
           END AS BIGINT) AS ari_milli
    FROM sc
    """


_PURITY_ORACLE = _CT_CTE + """
    SELECT cid, CAST(sum(nij) AS BIGINT) AS size,
           CAST((min(struct_pack(a := -nij, l := label))).l AS BIGINT)
             AS majority_label,
           CAST((1000 * -(min(struct_pack(a := -nij, l := label))).a)
                // sum(nij) AS BIGINT) AS purity_milli
    FROM ct GROUP BY cid
    """


def _assignments(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    vectors = load(spark, sf_dir, "embeddings")
    comps = int_components(vectors)
    _, assign = kmeans_lloyd(comps, KM_K, KM_ITERS)
    labels = vectors.select(
        F.col("vec_id").alias("vid"), F.col("label").cast("long").alias("label")
    )
    return assign, labels


@register("kmeans_label_ari", oracle=_ARI_ORACLE)
def kmeans_label_ari(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index of the integer-Lloyd assignment against the
    embeddings' ground-truth labels — the full K-iteration trajectory,
    contingency, pair counts, and the chance-corrected ratio all
    replayed by DuckDB in exact integers."""
    assign, labels = _assignments(spark, sf_dir)
    return ari_milli(contingency(assign, labels))


@register("kmeans_cluster_purity", oracle=_PURITY_ORACLE)
def kmeans_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster size, majority label (deterministic tie-break), and
    milli purity over the same trajectory."""
    assign, labels = _assignments(spark, sf_dir)
    return cluster_purity(contingency(assign, labels))


# ---- composed chain: label-noise candidates by cluster disagreement --------


def label_disagreement(
    assign: DataFrame, labels: DataFrame, *,
    id_col: str = "vid", pred_col: str = "cid", label_col: str = "label",
) -> DataFrame:
    """(vid, label, cid, majority_label, disagrees) — documents whose
    own label differs from their cluster's majority label: the
    cheapest large-scale label-noise candidate list (the geometric
    neighborhood outvotes the tag — the 'confident learning' intuition
    with the cluster majority as the confident predictor). The
    majority frame is one row per cluster; the flag is a broadcast
    join back onto the slim assignment."""
    ct = contingency(assign, labels, id_col=id_col,
                     pred_col=pred_col, label_col=label_col)
    maj = cluster_purity(ct).select(pred_col, "majority_label")
    return (
        assign.join(labels, id_col)
        .join(F.broadcast(maj), pred_col)
        .select(
            id_col, label_col, pred_col, "majority_label",
            (F.col(label_col) != F.col("majority_label")).alias("disagrees"),
        )
    )


_DISAGREE_ORACLE = _CT_CTE + f""",
    maj AS (
      SELECT cid,
             CAST((min(struct_pack(a := -nij, l := label))).l AS BIGINT)
               AS majority_label
      FROM ct GROUP BY cid
    )
    SELECT a.vid, CAST(e.label AS BIGINT) AS label, a.cid,
           m.majority_label,
           CAST(e.label AS BIGINT) <> m.majority_label AS disagrees
    FROM a{KM_ITERS} a
    JOIN embeddings e ON a.vid = e.vec_id
    JOIN maj m USING (cid)
    """


@register("label_noise_candidates", oracle=_DISAGREE_ORACLE)
def label_noise_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-disagreement label-noise candidates over the Lloyd
    trajectory — assignment, contingency, majority election, and every
    per-vector flag replayed by DuckDB."""
    assign, labels = _assignments(spark, sf_dir)
    return label_disagreement(assign, labels)
