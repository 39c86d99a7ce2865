"""The extraction operator — Arrow-batched mapInPandas over pages.

This is the Spark wrapper around the pure kernels
(readur_spark.kernels.extract.extract_page): the reference's
upload→queue→worker pipeline (SURVEY.md §3.1) collapses into one
narrow-dependency stage — no shuffle, no queue, no locks. Batches
arrive as pandas DataFrames over Arrow (512 rows/batch by session
default, bounding executor memory for MB-scale payloads).

Vectorization strategy (north_rule "no per-row Python" reading):
  - transfer is columnar Arrow end-to-end; there is no row-at-a-time
    Python UDF anywhere (each UDF invocation processes a whole batch);
  - parsing variable-length binary payloads (PDF object streams, DOM
    trees) is inherently per-document — the reference forks a whole
    subprocess per document here; a batched in-process parse with
    numpy-vectorized pixel/byte kernels is the Spark-native strict
    improvement. One kernel code path serves both golden tests and
    production, so byte-identity cannot drift between a "fast path"
    and a "reference path";
  - relational columns (sha256 dedup key, size, priority bucket) use
    JVM-side built-ins (F.sha2, F.when) and never touch Python.

Cost model at 100 TB: stage is embarrassingly parallel; throughput
scales with cores until input scan bandwidth saturates. The only
shuffle in the flagship pipeline is the upstream dedup (operators/
dedup.py); extraction itself preserves partitioning.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from readur_spark import schemas
from readur_spark.kernels.extract import extract_page
from readur_spark.kernels.settings import DEFAULT_SETTINGS

# columns mapInPandas needs; everything else is pruned before the
# Python boundary (don't ship `text`/`lang` through Arrow for nothing).
# sha256/priority are cheap JVM-computed passthroughs (echoed, never
# recomputed in Python) so the output table is self-contained without
# a post-extraction join.
_INPUT_COLS = ["url", "html"]
# lang rides through as a slim passthrough so per-language rollups never
# need to join the MB-scale extraction output back to the pages table
# (that join shuffles extracted_text payload bytes just to fetch a
# 2-char code — wasteful at 100 TB).
_PASSTHROUGH_COLS = [
    "sha256", "priority", "warc_ts", "is_duplicate", "duplicate_of", "lang",
    "license_id", "permissive",
]
_PASSTHROUGH_TYPES = {
    "sha256": "string",
    "priority": "int",
    "warc_ts": "timestamp",
    "is_duplicate": "boolean",
    "duplicate_of": "string",
    "lang": "string",
    # ml/license.py signals attached upstream by run_extraction
    # --license-signals; echoed through so the curation tier can gate
    "license_id": "string",
    "permissive": "boolean",
}


def _extract_batch(batch: pd.DataFrame, settings: dict) -> pd.DataFrame:
    t0 = time.monotonic()
    n = len(batch)
    urls = batch["url"].tolist()  # plain lists: .iloc per row costs ~µs each
    htmls = batch["html"].tolist()

    out = {
        "url": urls,
        "mime_type": [None] * n,
        "file_size": [0] * n,
        "extracted_text": [None] * n,
        "confidence": [None] * n,
        "word_count": [None] * n,
        "status": [None] * n,
        "failure_reason": [None] * n,
        "failure_stage": [None] * n,
        "error": [None] * n,
        "preprocessing_applied": [None] * n,
    }

    for i in range(n):
        data = htmls[i]
        data = bytes(data) if data is not None else b""
        r = extract_page(urls[i], data, settings)
        out["mime_type"][i] = r.mime_type
        out["file_size"][i] = r.file_size
        out["extracted_text"][i] = r.extracted_text
        out["confidence"][i] = r.confidence
        out["word_count"][i] = r.word_count
        out["status"][i] = r.status
        out["failure_reason"][i] = r.failure_reason
        out["failure_stage"][i] = r.failure_stage
        out["error"][i] = r.error
        out["preprocessing_applied"][i] = r.preprocessing_applied

    wall_ms = int((time.monotonic() - t0) * 1000)
    df = pd.DataFrame(out)
    # amortize batch wall time across rows; per-partition metrics sum it
    df["processing_time_ms"] = max(wall_ms, 0) // max(n, 1)
    return df


_OUTPUT_FIELDS = [
    "url", "mime_type", "file_size", "extracted_text", "confidence",
    "word_count", "processing_time_ms", "status", "failure_reason",
    "failure_stage", "error", "preprocessing_applied", "partition_id",
]

_EXTRACT_SCHEMA = (
    "url string, mime_type string, file_size long, extracted_text string,"
    " confidence float, word_count int, processing_time_ms long,"
    " status string, failure_reason string, failure_stage string,"
    " error string, preprocessing_applied array<string>, partition_id int"
)


def extract_pages(df: DataFrame, settings: dict | None = None) -> DataFrame:
    """pages(url, warc_ts, html, …) → extracted rows. Narrow stage;
    input partitioning is preserved. sha256/priority columns (from
    `with_relational_columns`) are echoed through when present."""
    settings = dict(settings) if settings else dict(DEFAULT_SETTINGS)
    passthrough = [c for c in _PASSTHROUGH_COLS if c in df.columns]
    out_fields = _OUTPUT_FIELDS + passthrough
    schema = _EXTRACT_SCHEMA + "".join(
        ", %s %s" % (c, _PASSTHROUGH_TYPES[c]) for c in passthrough
    )

    def run(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for batch in iterator:
            out = _extract_batch(batch, settings)
            out["partition_id"] = pid
            for c in passthrough:
                out[c] = batch[c].values
            yield out[out_fields]

    return df.select(*(_INPUT_COLS + passthrough)).mapInPandas(run, schema=schema)


def filter_allowed_pages(
    pages: DataFrame,
    settings: dict | None = None,
    keep_extensionless: bool = True,
) -> DataFrame:
    """A7 — the ingest allow-list (src/services/file_service.rs:204-214,
    defaults settings.rs:314-322) as a JVM-side predicate on the url
    extension, applied BEFORE any payload is shipped to Python (the
    reference gates at upload/sync ingest, before content sniffing; at
    100 TB this keeps disallowed payloads out of the Arrow boundary
    entirely and pushes down to the scan).

    keep_extensionless=True is the documented web deviation: the
    reference's filesystem contract rejects extensionless names
    (Path::extension → None → false), but Common-Crawl urls routinely
    have no extension and carry the payload type in the content; pass
    False for the reference-strict behavior. The pure-kernel twin is
    kernels.mime.is_allowed_file_type."""
    settings = settings or DEFAULT_SETTINGS
    allowed = [t.lower() for t in settings.get("allowed_file_types") or []]
    path = F.regexp_replace(F.col("url"), "[?#].*$", "")
    name = F.regexp_extract(path, "([^/]*)$", 1)
    ext = F.lower(F.regexp_extract(name, "\\.([^.]+)$", 1))
    cond = ext.isin(allowed)
    if keep_extensionless:
        cond = cond | (ext == "")
    return pages.filter(cond)


def with_relational_columns(pages: DataFrame) -> DataFrame:
    """JVM-side columns that never cross the Python boundary:
    sha256 dedup key (A5 — built-in F.sha2, no UDF), size, priority
    bucket (A9 — src/ingestion/batch_ingest.rs:281-294).

    An existing sha256 column is kept: tables that materialized the
    hash at ingest (the reference's documents.file_hash — SURVEY §1.2;
    an Iceberg column at scale) let the dedup winner subtree run as a
    column-pruned slim scan instead of re-reading and re-hashing the
    payload."""
    mb = 1024 * 1024
    size = F.coalesce(F.length("html"), F.lit(0)).cast("long")
    if "sha256" not in pages.columns:
        pages = pages.withColumn("sha256", F.sha2(F.col("html"), 256))
    return pages.withColumn(
        "file_size", size
    ).withColumn(
        "priority",
        F.when(size <= mb, 10)
        .when(size <= 5 * mb, 8)
        .when(size <= 10 * mb, 6)
        .when(size <= 50 * mb, 4)
        .otherwise(2),
    )


def partition_metrics(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition metrics rows (north_rule): docs/sec, bytes/sec,
    parse-failure counts — one groupBy over the extraction output."""
    agg = extracted.groupBy("partition_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("file_size").alias("n_bytes"),
        F.sum(F.when(F.col("status") == "completed", 1).otherwise(0)).alias(
            "n_completed"
        ),
        F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias("n_failed"),
        F.sum("processing_time_ms").alias("wall_ms"),
    )
    return agg.select(
        F.lit(run_id).alias("run_id"),
        "partition_id",
        "n_docs",
        "n_bytes",
        "n_completed",
        "n_failed",
        "wall_ms",
        (F.col("n_docs") / F.greatest(F.col("wall_ms") / 1000.0, F.lit(0.001))).alias(
            "docs_per_sec"
        ),
        (F.col("n_bytes") / F.greatest(F.col("wall_ms") / 1000.0, F.lit(0.001))).alias(
            "bytes_per_sec"
        ),
    )
