"""The flagship extraction pipeline — the reference's upload→queue→
worker lifecycle (SURVEY.md §3.1) as one declarative Spark DAG:

    read pages → relational columns (JVM) → dedup (one shuffle) →
    url-hash repartition (priority-prefixed) → mapInPandas(extract) →
    extracted [+ per-partition metrics + lineage]

The queue (B21), worker claims (FOR UPDATE SKIP LOCKED), stale
recovery, and transactional upserts (B26) have no Spark analog because
they solve problems Spark's execution model already solves:
deterministic task assignment, task retry, and snapshot-atomic commits
(operators/checkpoint.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from readur_spark.operators import dedup as dedup_ops
from readur_spark.operators.extract import (
    extract_pages,
    partition_metrics,
    with_relational_columns,
)
from readur_spark.operators.partitioning import repartition_by_url_hash


def load_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def extract_corpus(
    pages: DataFrame,
    settings: dict | None = None,
    num_partitions: int | None = None,
    dedup_policy: str = dedup_ops.POLICY_SKIP,
) -> DataFrame:
    """pages → extracted DataFrame (lazy; caller writes or aggregates)."""
    pages = with_relational_columns(pages)

    if dedup_policy == dedup_ops.POLICY_SKIP:
        pages = dedup_ops.dedup_skip(pages)
    elif dedup_policy == dedup_ops.POLICY_TRACK:
        pages = dedup_ops.dedup_track(pages)
    # POLICY_ALLOW: no dedup stage at all

    if num_partitions is None:
        sc = pages.sparkSession.sparkContext
        num_partitions = max(sc.defaultParallelism, 8)
    pages = repartition_by_url_hash(pages, num_partitions)

    return extract_pages(pages, settings)


def run(
    spark: SparkSession,
    pages_path: str,
    settings: dict | None = None,
    num_partitions: int | None = None,
    run_id: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (extracted, metrics) for a corpus path."""
    run_id = run_id or uuid.uuid4().hex[:12]
    pages = load_pages(spark, pages_path)
    extracted = extract_corpus(pages, settings, num_partitions)
    metrics = partition_metrics(extracted, run_id)
    return extracted, metrics
