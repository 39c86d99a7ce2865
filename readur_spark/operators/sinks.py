"""Training-data sinks: partitioned, size-bounded shard layouts.

The reference's outputs land in Postgres rows + a file store
(src/services/file_service.rs); a training pipeline's output contract
is different: a *layout* — `split=train/lang=en/part-*.parquet` — that
downstream dataloaders list, shard, and stream. These writers encode
the two properties that matter at 100 TB:

* **Partition directories** (`partitionBy`) so dataloaders prune by
  split/lang from the path alone — no manifest service needed, and a
  Spark/Trino/DuckDB reader all get partition pruning for free.
* **Bounded file sizes** (`maxRecordsPerFile`) so no shard exceeds
  what a single dataloader worker streams; Spark splits oversized
  partitions into part-files without an extra shuffle.

Determinism: rows are pre-sorted within partitions by the id column,
so re-running the job yields byte-identical shard contents given the
same input snapshot (the property the checkpoint lineage rows assert
end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str],
    id_col: str,
    max_records_per_file: int = 100_000,
    fmt: str = "parquet",
    write_buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a partitioned shard layout.

    fmt='parquet' for analytical re-reads, fmt='json' for JSONL
    consumers (one object per line — the interchange format most
    training dataloaders speak).

    The shuffle key is (partition_cols, hash-bucket of id): partition
    columns alone are low-cardinality (an ~80% train split would
    serialize into ONE writer task at corpus scale), so each combo
    fans out across `write_buckets` tasks (default: the session's
    parallelism). Bucketing is deterministic, so shard contents stay
    reproducible; only the row→part-file assignment gains parallelism.
    """
    if write_buckets is None:
        write_buckets = df.sparkSession.sparkContext.defaultParallelism
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(write_buckets))
    out = df.repartition(
        *[F.col(c) for c in partition_cols], bucket
    ).sortWithinPartitions(*partition_cols, id_col)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .format(fmt)
        .save(path)
    )


def read_training_shards(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read a shard layout back; partition columns come from the
    directory names (Spark partition discovery)."""
    return spark.read.format(fmt).load(path)


def compact_shards(
    spark: SparkSession,
    path: str,
    *,
    partition_cols: list[str],
    id_col: str,
    max_records_per_file: int = 100_000,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction — the maintenance job (Iceberg's
    rewrite_data_files analog) that every incrementally-appended layout
    needs: thousands of per-commit part-files become task-scheduling
    overhead long before they become a storage problem.

    Rewrites the layout through a staging directory and a rename swap.
    Readers see a partial state only in the instant between the two
    renames (a true atomic exchange needs a catalog pointer — Iceberg's
    actual mechanism — or renameat2; this is the filesystem
    approximation). The swap is crash-recoverable: a leftover `.old`
    from a crash between the renames is restored on the next call, and
    stale staging dirs are cleared, so no crash sequence loses data.
    Returns the number of part-files after compaction. Contents are
    preserved exactly (same rows, same within-file order rule as
    write_training_shards)."""
    import os
    import shutil

    staging = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".old"
    # crash recovery: a previous run died between its two renames —
    # the data lives at `.old` and `path` is gone; restore it first
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    df = read_training_shards(spark, path, fmt)
    write_training_shards(
        df, staging, partition_cols=partition_cols, id_col=id_col,
        max_records_per_file=max_records_per_file, fmt=fmt,
    )
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    n = 0
    for root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if not f.startswith(("_", ".")))
    return n
