"""Rendezvous (highest-random-weight) shard assignment.

The standard consistent-sharding recipe (Thaler & Ravishankar 1998,
the HRW paper; the scheme behind Ceph/Ring-style placement): a doc's
shard is `argmax_s H(doc, s)` over the shard list.  Its minimal-
movement property is WHY a 10^12-doc corpus shards this way: growing
S → S+1 moves only ~1/(S+1) of documents (exactly the docs whose new
shard wins the argmax), whereas `hash % S` reshuffles ~all of them.
A stable re-shard means dedup band tables, ANN partitions, and
training shards can grow capacity without rewriting the corpus.

Spark-first: the argmax is a pure array-HOF projection per document —
`array_max(transform(sequence(0,S-1), s → struct(h(doc,s), s)))` —
no explode, no shuffle, no Python.  The query emits the assignment at
S and S+1 shards plus the `moved` bit, so the minimal-movement
property is value-checked in data, not just asserted.

Reference analogue: readur partitions work by content hash for its
dedup policies (SURVEY §2 A5/A6); HRW is the placement generalization
the distributed tier needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

N_SHARDS = 8


def hrw_shard(id_expr: str, n_shards: int) -> F.Column:
    """argmax_s md5('hrw'‖id‖'_'‖s) as the shard id (ties broken by
    the larger s via struct comparison — deterministic either way
    since 32-hex-digit collisions don't occur across 8 shards)."""
    h = (
        f"cast(conv(substring(md5(concat('hrw', cast({id_expr} as string), "
        f"'_', cast(s as string))), 1, 8), 16, 10) as bigint)"
    )
    return F.expr(
        f"array_max(transform(sequence(0, {n_shards - 1}), "
        f"s -> struct({h} as w, s))).s"
    ).cast("int")


def rendezvous_assignment(
    df: DataFrame, *, id_col: str = "doc_id", n_shards: int = N_SHARDS
) -> DataFrame:
    """(doc_id, shard, shard_grow, moved): assignment at n_shards and
    n_shards+1, with the moved bit exposing the ~1/(S+1) property."""
    return df.select(
        F.col(id_col),
        hrw_shard(id_col, n_shards).alias("shard"),
        hrw_shard(id_col, n_shards + 1).alias("shard_grow"),
    ).withColumn("moved", F.col("shard") != F.col("shard_grow"))


def _oracle(n_shards: int) -> str:
    def assign(cte: str, s: int) -> str:
        return f"""
  SELECT doc_id, CAST(s AS INT) AS shard
  FROM (
    SELECT doc_id, s,
           row_number() OVER (
             PARTITION BY doc_id
             ORDER BY CAST('0x' || substring(
               md5('hrw' || CAST(doc_id AS VARCHAR) || '_'
                   || CAST(s AS VARCHAR)), 1, 8) AS BIGINT) DESC,
               s DESC) AS rk
    FROM documents
    CROSS JOIN (SELECT unnest(range(0, {s})) AS s) sh
  ) WHERE rk = 1
"""

    return f"""
WITH a AS ({assign('a', n_shards)}),
     b AS ({assign('b', n_shards + 1)})
SELECT a.doc_id, a.shard, b.shard AS shard_grow,
       a.shard <> b.shard AS moved
FROM a JOIN b ON a.doc_id = b.doc_id
"""


@register("rendezvous_shard_assign", oracle=_oracle(N_SHARDS))
def rendezvous_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HRW shard assignment at S and S+1 shards, value-hashed: DuckDB
    replays every per-shard hash draw and both argmaxes (row_number
    DESC twin of the struct-max), plus the moved bit."""
    return rendezvous_assignment(load(spark, sf_dir, "documents"))


# ---- shard-balance diagnostics (r5s11) -------------------------------------


def shard_balance(assignment: DataFrame, *, shard_col: str = "shard") -> DataFrame:
    """One row (n_shards, n_docs, min_sz, max_sz, skew_permille,
    gini_ppm) over a shard assignment — the placement-health readout
    every re-shard publishes:

      skew_permille = 1000·(max − min) div max     (range skew)
      gini_ppm      = 10^6·(Σᵢ (2i−1)·szᵢ − n·Σ sz) div (n·Σ sz)
                      (sizes sorted ascending, i 1-based — the exact
                      integer prefix form of the Gini coefficient)

    Scale: one map-side-combinable count per shard, then all work on
    the |shards|-row frame."""
    sizes = assignment.groupBy(shard_col).agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    w = Window.orderBy("sz", shard_col)
    ranked = sizes.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.sum("sz").cast("long").alias("n_docs"),
        F.min("sz").alias("min_sz"),
        F.max("sz").alias("max_sz"),
        F.sum(F.expr("(2L * i - 1) * sz")).alias("_num"),
    ).select(
        "n_shards",
        "n_docs",
        "min_sz",
        "max_sz",
        F.expr("(1000L * (max_sz - min_sz)) div max_sz").alias(
            "skew_permille"
        ),
        # Σ(2i−1)sz − n·Σsz ≥ 0 by the rearrangement inequality
        # (ascending sizes), so truncating div is floor here
        F.expr(
            "(1000000L * (_num - n_shards * n_docs)) div "
            "(n_shards * n_docs)"
        ).alias("gini_ppm"),
    )


@register(
    "shard_balance_gini",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, CAST(s AS INT) AS shard
      FROM (
        SELECT doc_id, s,
               row_number() OVER (
                 PARTITION BY doc_id
                 ORDER BY CAST('0x' || substring(
                   md5('hrw' || CAST(doc_id AS VARCHAR) || '_'
                       || CAST(s AS VARCHAR)), 1, 8) AS BIGINT) DESC,
                   s DESC) AS rk
        FROM documents
        CROSS JOIN (SELECT unnest(range(0, {N_SHARDS})) AS s) sh
      ) WHERE rk = 1
    ), sizes AS (
      SELECT shard, CAST(count(*) AS BIGINT) AS sz FROM a GROUP BY shard
    ), ranked AS (
      SELECT sz, row_number() OVER (ORDER BY sz, shard) AS i FROM sizes
    ), agg AS (
      SELECT count(*) AS n_shards,
             CAST(sum(sz) AS BIGINT) AS n_docs,
             min(sz) AS min_sz, max(sz) AS max_sz,
             CAST(sum((2 * i - 1) * sz) AS BIGINT) AS num
      FROM ranked
    )
    SELECT n_shards, n_docs, min_sz, max_sz,
           CAST((1000 * (max_sz - min_sz)) // max_sz AS BIGINT)
             AS skew_permille,
           CAST((1000000 * (num - n_shards * n_docs))
                // (n_shards * n_docs) AS BIGINT) AS gini_ppm
    FROM agg
    """,
)
def shard_balance_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance readout over the HRW assignment, value-hashed:
    DuckDB replays the argmax assignment, per-shard sizes, and the
    exact-integer range-skew and Gini arithmetic."""
    docs = load(spark, sf_dir, "documents")
    assign = docs.select(
        "doc_id", hrw_shard("doc_id", N_SHARDS).alias("shard")
    )
    return shard_balance(assign)
