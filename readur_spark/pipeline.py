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
    dedup_stage: str = "pre",
) -> DataFrame:
    """pages → extracted DataFrame (lazy; caller writes or aggregates).

    Shuffle/compute budget (payloads are MB-scale, kernel CPU
    ms-scale/doc — both matter):

    dedup_stage='pre' (default): the winner set is a JVM-only subtree
    (scan → F.sha2 → slim (sha256, warc_ts, url) agg — no Python);
    the payload side semi-joins on url (AQE broadcasts the winner set
    when it fits, else a shuffle join whose hash(url) output
    partitioning extraction consumes directly) and extraction runs
    ONCE, on winners only. The payload is scanned twice, but the
    second scan does no Python work — and any content dedup must hash
    the payload anyway.

    dedup_stage='post': extraction first, winner selection on the
    extracted output's echoed (sha256, warc_ts, url). A lazy plan
    would re-execute the extraction subtree for the winner agg
    (measured: MapInPandas appeared twice in the physical plan), so
    this mode persists the extracted frame first. Use it when the
    extracted output is materialized anyway (e.g. committed to the
    snapshot store and deduplicated on read-back — what
    jobs/run_extraction.py does at scale); 'pre' is the right default
    for a one-shot lazy pipeline."""
    pages = with_relational_columns(pages)

    if dedup_policy == dedup_ops.POLICY_ALLOW:
        if num_partitions is not None:
            pages = repartition_by_url_hash(pages, num_partitions)
        return extract_pages(pages, settings)

    if dedup_stage == "pre":
        if dedup_policy == dedup_ops.POLICY_SKIP:
            pages = dedup_ops.dedup_skip(pages)
        else:
            pages = dedup_ops.dedup_track(pages)
        return extract_pages(pages, settings)

    from pyspark import StorageLevel

    extracted = extract_pages(pages, settings).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if dedup_policy == dedup_ops.POLICY_SKIP:
        return dedup_ops.dedup_skip(extracted)
    return dedup_ops.dedup_track(extracted)


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
