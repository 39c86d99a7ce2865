"""Continuous ingestion — the reference's folder watcher on Spark.

Reference semantics (yonasBSD/readur): a filesystem watcher feeds new
files into the same ingest→extract path as uploads — notify events or
30 s polling with hybrid strategy selection
(src/scheduling/watcher.rs:22-125), plus periodic source sync with
per-file change detection (src/scheduling/source_sync.rs). There are
no watermarks, windows, or stream joins in the reference; "late data"
is simply the next incremental batch (SURVEY.md §2 streaming note).

Spark mapping: Structured Streaming file source discovers new page
files (the watcher), and each micro-batch runs the *batch* extraction
pipeline via foreachBatch, deduplicating against the snapshot store
and committing one snapshot per batch:

  - Trigger.AvailableNow  → "catch up on the backlog, then stop" (the
    reference's startup sync, src/main.rs:289-310)
  - processingTime trigger → the 30 s polling watcher
  - restart safety: the streaming checkpoint replays an unacknowledged
    batch; commits are idempotent because the snapshot manifest is
    keyed by batch id — a replayed batch finds its manifest and skips
    (readur needed conditional UPDATEs for the same guarantee,
    src/db_guardrails_simple.rs:26-137)

At 100 TB the same topology holds: the file source scales via listing
parallelism, each micro-batch is a full parallel batch job, and the
store commit becomes an Iceberg MERGE/append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from readur_spark import schemas
from readur_spark.operators.checkpoint import SnapshotStore
from readur_spark.operators.dedup import dedup_against_existing, with_sha256
from readur_spark.pipeline import extract_corpus


def read_pages_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of pages (explicit schema — never infer)."""
    reader = spark.readStream.schema(schemas.PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    store: SnapshotStore,
    checkpoint_dir: str,
    settings: dict | None = None,
    available_now: bool = True,
    processing_interval: str = "30 seconds",
    max_files_per_trigger: int | None = None,
):
    """Start the watcher→extract stream; returns the StreamingQuery.

    Each micro-batch: dedup against everything already committed
    (content-hash anti-join — the reference's per-file hash lookup,
    src/db/documents/crud.rs:117-134) → batch extraction pipeline →
    one atomic snapshot commit keyed by batch id (idempotent replay).
    """
    pages = read_pages_stream(spark, input_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_id = "stream-batch-%d" % batch_id
        if any(s["run_id"] == run_id for s in store.snapshots()):
            return  # replayed batch after restart — already committed
        fresh = batch_df
        done = store.read(spark)
        if done is not None:
            fresh = dedup_against_existing(
                with_sha256(batch_df), done.select("sha256")
            )
        if not fresh.take(1):
            return
        extracted = extract_corpus(fresh, settings)
        store.commit(extracted, run_id=run_id, meta={"batch_id": batch_id})

    writer = (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    min_words: int = 50,
    redact: bool = False,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    url_gates: bool = False,
    blocked_domains: list[str] | None = None,
    nfc: bool = False,
    line_filter: bool = False,
):
    """Continuous curation: extracted-docs stream → [url gates] →
    [NFC] → [C4 line gates] → C4/Gopher doc gates → (optional) PII
    scrub → hash split → shard append. The batch curation job
    (jobs/run_curation.py) run as a watcher; the optional hygiene
    stages are the job's round-3 flags — only the STATELESS ones
    (per-row projections / a static blocklist join) are offered here,
    because they are trigger-invariant: the same row gets the same
    verdict in any micro-batch. The LM-surprisal filter is deliberately
    absent — its vocabulary is a corpus-global statistic, and training
    it per micro-batch would score early batches against a different
    model than late ones (run it as the batch job over the
    accumulated layout instead).

    Per micro-batch the foreachBatch body anti-joins against the urls
    already shipped, so restarts and replays are idempotent at the
    layout level (same guarantee shape as the extraction stream's
    manifest-keyed commits). Returns the StreamingQuery.
    """
    import os

    from pyspark.sql import functions as F

    from readur_spark import schemas
    from readur_spark.ml.webfilters import (
        redact_pii,
        web_filter_signals,
        with_hash_split,
    )

    docs = (
        spark.readStream.schema(schemas.EXTRACTED)
        .option(
            "maxFilesPerTrigger", max_files_per_trigger
        ).parquet(input_dir)
        if max_files_per_trigger is not None
        else spark.readStream.schema(schemas.EXTRACTED).parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if url_gates:
            from readur_spark.ml.urlfilters import with_url_gates

            bl = None
            if blocked_domains:
                bl = spark.createDataFrame(
                    [(d,) for d in blocked_domains], "domain string"
                )
            batch_df = (
                with_url_gates(batch_df, bl, url_col="url")
                .filter(F.col("url_keep"))
                .drop(
                    "host", "domain", "url_bad_host", "url_ip_host",
                    "url_has_port", "url_too_long", "url_badword",
                    "url_blocked_domain", "url_keep",
                )
            )
        if nfc:
            from readur_spark.ml.normalize import (
                clean_whitespace,
                nfc_normalize_col,
            )

            batch_df = batch_df.withColumn(
                "extracted_text",
                clean_whitespace(nfc_normalize_col(F.col("extracted_text"))),
            )
        if line_filter:
            from readur_spark.ml.linefilters import c4_line_filter

            batch_df = (
                c4_line_filter(
                    batch_df, text_col="extracted_text", out_col="__clean"
                )
                .withColumn("extracted_text", F.col("__clean"))
                .drop("__clean", "n_lines", "n_lines_kept")
            )
        text = F.col("extracted_text")
        sig = web_filter_signals(text, min_words=min_words)
        gated = batch_df.filter(text.isNotNull()).select(
            "url", text.alias("text"),
            sig["n_words"].alias("n_words"), sig["keep"].alias("keep"),
        ).filter(F.col("keep") == 1)
        out = gated
        if redact:
            out = out.withColumn("text", redact_pii(F.col("text")))
        split = with_hash_split(out, "url").select(
            "url", "text", "n_words", "split"
        )
        if os.path.isdir(output_dir):
            # explicit schema: a pre-created/empty output dir (mkdir
            # before first commit, or a crash between mkdir and write)
            # must read as EMPTY, not kill the stream with an
            # 'Unable to infer schema' AnalysisException
            existing = (
                spark.read.schema(split.schema)
                .parquet(output_dir)
                .select("url")
            )
            split = split.join(existing, "url", "left_anti")
        if not split.take(1):
            return
        (
            split.repartition("split").sortWithinPartitions("split", "url")
            .write.mode("append").partitionBy("split").parquet(output_dir)
        )

    writer = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()
