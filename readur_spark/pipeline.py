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
    dedup_stage: str = "post",
) -> DataFrame:
    """pages → extracted DataFrame (lazy; caller writes or aggregates).

    Shuffle budget (the scale-limiting resource — payloads are MB-scale
    while kernel CPU is ms-scale/doc):

    dedup_stage='post' (default, the single-pass scale path): ONE
    payload pass — the scan projection computes sha256 (JVM F.sha2)
    and feeds extraction directly; dedup runs downstream on the slim
    extracted output (winner agg over (sha256, warc_ts, url) + semi
    join, AQE-broadcast when the winner set fits). Identical output to
    pre-extraction Skip dedup: duplicate payloads extract to identical
    bytes, and the winner rule min(warc_ts, url) only consults echoed
    columns. Costs extraction CPU on duplicate rows (~dup-rate %);
    saves an entire payload read+hash pass — the right trade for
    CC-style corpora (dups are minority) at 100 TB, where the payload
    pass, not kernel CPU, is the bottleneck.

    dedup_stage='pre' (the high-dup-rate path): winner set from a
    payload-hashing pass, then a second payload pass semi-joined on
    url (AQE-broadcast when small; shuffle join otherwise, whose
    hash(url) output partitioning extraction consumes directly).
    Never extracts duplicates; reads the payload twice."""
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

    extracted = extract_pages(pages, settings)
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
