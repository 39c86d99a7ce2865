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

from pyspark.sql import DataFrame, SparkSession
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
