"""Length-bucketed batching and padding-waste accounting.

Fixed-shape training batches pad every sequence to the batch max;
with naturally mixed document lengths the padding waste is routinely
20-40% of compute.  The standard fix (bucketing by length before
batching — the `--group_by_length` recipe) cuts it to a few percent.
This module forms both batchings DETERMINISTICALLY and publishes the
waste accounting, so a curation run can report the padding bill of
its corpus before any trainer starts:

  - shard: content-addressed md5 shard (batching is per-shard at
    scale — no global order exists at 10^12 docs, and none is used
    here: every window is PARTITIONED BY shard);
  - naive strategy: within-shard order by content hash (the
    shuffled-dataloader baseline);
  - bucketed strategy: within-shard order by (length-bucket, hash) —
    same shards, same batch size, same docs, only the order changes;
  - batch_id = (row_number − 1) div B; per batch the padded cost is
    max(len)·count and the waste is padded − Σ len (exact integers).

Output: one row per strategy with batch counts and waste per mille —
the bucketed row's waste should undercut the naive row's on any
real length distribution.

Scale: one slim (doc, len, shard) projection; two per-shard sorts of
that slim frame (the payload never moves); the rollup is map-side
combinable.  B and the bucket width are constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

BATCH_SIZE = 8
MAX_SEQ = 1024
BUCKET_W = 64   # length-bucket width (tokens)
N_SHARDS = 4


def padding_report(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(strategy, n_batches, total_tokens, padded_tokens,
    waste_permille) for 'naive' and 'bucketed' batch formation."""
    base = df.select(
        F.col(id_col),
        F.least(
            F.size(
                F.filter(
                    F.split(F.col(text_col), r"\s+"), lambda t: t != ""
                )
            ).cast("long"),
            F.lit(MAX_SEQ).cast("long"),
        ).alias("len"),
        F.expr(
            f"cast(conv(substring(md5(concat('bat', cast({id_col} as "
            f"string))), 1, 8), 16, 10) as bigint)"
        ).alias("h"),
    ).withColumn("shard", F.expr(f"h % {N_SHARDS}"))

    def strategy(name: str, order_cols) -> DataFrame:
        w = Window.partitionBy("shard").orderBy(*order_cols)
        batched = base.withColumn("rn", F.row_number().over(w)).withColumn(
            "batch", F.expr(f"(rn - 1) div {BATCH_SIZE}")
        )
        per_batch = batched.groupBy("shard", "batch").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("len").alias("mx"),
            F.sum("len").alias("tot"),
        )
        return per_batch.agg(
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("tot").cast("long").alias("total_tokens"),
            F.sum(F.col("mx") * F.col("cnt")).cast("long").alias(
                "padded_tokens"
            ),
        ).select(
            F.lit(name).alias("strategy"),
            "n_batches",
            "total_tokens",
            "padded_tokens",
            F.expr(
                "(1000L * (padded_tokens - total_tokens)) div padded_tokens"
            ).alias("waste_permille"),
        )

    naive = strategy("naive", [F.col("h"), F.col(id_col)])
    bucketed = strategy(
        "bucketed",
        [F.expr(f"len div {BUCKET_W}"), F.col("h"), F.col(id_col)],
    )
    return naive.unionByName(bucketed)


_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         least(CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                    t -> t <> '')) AS BIGINT),
               {MAX_SEQ}) AS l,
         CAST('0x' || substring(
           md5('bat' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM documents
), sharded AS (
  SELECT *, h % {N_SHARDS} AS shard FROM base
), naive AS (
  SELECT shard, l,
         (row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1)
           // {BATCH_SIZE} AS batch
  FROM sharded
), bucketed AS (
  SELECT shard, l,
         (row_number() OVER (PARTITION BY shard
            ORDER BY l // {BUCKET_W}, h, doc_id) - 1)
           // {BATCH_SIZE} AS batch
  FROM sharded
), roll AS (
  SELECT 'naive' AS strategy, shard, batch, count(*) AS cnt,
         max(l) AS mx, sum(l) AS tot
  FROM naive GROUP BY ALL
  UNION ALL
  SELECT 'bucketed', shard, batch, count(*), max(l), sum(l)
  FROM bucketed GROUP BY ALL
)
SELECT strategy,
       count(*) AS n_batches,
       CAST(sum(tot) AS BIGINT) AS total_tokens,
       CAST(sum(mx * cnt) AS BIGINT) AS padded_tokens,
       CAST((1000 * (sum(mx * cnt) - sum(tot))) // sum(mx * cnt)
            AS BIGINT) AS waste_permille
FROM roll GROUP BY strategy
"""


@register("padding_efficiency_report", oracle=_ORACLE)
def padding_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive vs length-bucketed batching waste, value-hashed: DuckDB
    replays the shard hashes, both within-shard orders, batch
    formation, and the exact-integer waste rollup."""
    return padding_report(load(spark, sf_dir, "documents"))
