"""Snapshot checkpointing, resume, and run ledgers.

The reference (yonasBSD/readur) keeps pipeline progress in Postgres:
a work queue with transactional claims (src/ocr/queue.rs:148-285),
stale-item recovery (src/ocr/queue.rs:1101-1121), requeue of failed
items behind an attempts budget (src/ocr/queue.rs:978-1082), and a
dead-letter table (src/db/documents/operations.rs:111-178). On Spark
those concerns collapse into snapshot-atomic table commits plus three
slim ledger tables (SURVEY.md §2 B21-B26, §4 "crash recovery").

The deployment target is an Iceberg catalog (BASELINE.json: "Iceberg
snapshot checkpointing with per-partition lineage + metrics"); this
sandbox has no Iceberg runtime jar, so `SnapshotStore` reproduces the
load-bearing subset of Iceberg's commit protocol over plain parquet:

  - every commit writes data files into an immutable snapshot
    directory, then publishes it with one atomic manifest rename —
    readers never observe a half-written snapshot (Iceberg's
    metadata-pointer swap);
  - the table's visible state is the union of published snapshots
    (append-only, like Iceberg fast-append);
  - a failed/killed run leaves only unpublished directories, which are
    invisible — re-running is safe and idempotent at the snapshot
    level (readur needed row locks + conditional UPDATEs for this:
    src/db_guardrails_simple.rs:26-137).

On a real cluster, replace SnapshotStore with `MERGE INTO`/`INSERT`
on an Iceberg table — the surrounding planner (resume_plan,
requeue_failed) is storage-agnostic and unchanged.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# queue schema default — migrations/20250620100001_add_ocr_queue.sql:8
DEFAULT_MAX_ATTEMPTS = 3


class SnapshotStore:
    """Append-only parquet table with atomic snapshot publication."""

    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "snapshots")
        self.manifest_dir = os.path.join(root, "manifests")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- commit protocol ---------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        run_id: str,
        meta: dict | None = None,
        url_buckets: int | None = None,
    ) -> str:
        """Write df as a new snapshot, publish atomically, return id.

        url_buckets: when set, lay the snapshot out partitioned by
        url_bucket = xxhash64(url) % N — the north-rule url-hash
        partitioning at the storage level (Iceberg `bucket(N, url)`
        transform's parquet analog). Downstream point lookups and
        co-bucketed joins then prune to one directory per bucket.
        Use ONE layout per store — `read` unions snapshot paths and
        mixed schemas (with/without the partition column) won't merge."""
        snapshot_id = "%d-%s" % (int(time.time() * 1000), uuid.uuid4().hex[:8])
        data_path = os.path.join(self.snap_dir, snapshot_id)
        if url_buckets:
            bucketed = df.withColumn(
                "url_bucket",
                F.pmod(F.xxhash64("url"), F.lit(url_buckets)).cast("int"),
            )
            bucketed.write.mode("errorifexists").partitionBy("url_bucket").parquet(
                data_path
            )
        else:
            df.write.mode("errorifexists").parquet(data_path)

        manifest = {
            "snapshot_id": snapshot_id,
            "run_id": run_id,
            "data_path": data_path,
            "committed_at_ms": int(time.time() * 1000),
            "meta": meta or {},
        }
        tmp = os.path.join(self.manifest_dir, ".%s.tmp" % snapshot_id)
        final = os.path.join(self.manifest_dir, "%s.json" % snapshot_id)
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)  # the atomic publication point
        return snapshot_id

    def snapshots(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.startswith(".") or not name.endswith(".json"):
                continue
            with open(os.path.join(self.manifest_dir, name)) as f:
                out.append(json.load(f))
        return out

    def is_empty(self) -> bool:
        return not self.snapshots()

    def read(self, spark: SparkSession) -> DataFrame | None:
        """Visible table state = union of published snapshots only."""
        snaps = self.snapshots()
        if not snaps:
            return None
        return spark.read.parquet(*[s["data_path"] for s in snaps])

    def read_with_commit_order(self, spark: SparkSession) -> DataFrame | None:
        """Like read(), plus per-row snapshot provenance columns
        (_snapshot_id, _commit_ms) so consumers can order rows by
        commit time — the Iceberg `_snapshot_id` metadata-column
        analog. Needed wherever 'latest attempt wins' matters
        (dead_letter); plain read() suffices for order-free rollups."""
        snaps = self.snapshots()
        if not snaps:
            return None
        out = None
        # _commit_seq: position in the manifest enumeration (sorted by
        # snapshot id = ms-prefixed filename) — a total order even when
        # two commits land in the same millisecond, and identical for
        # every reader (wall-ms alone can tie).
        for seq, s in enumerate(snaps):
            d = (
                spark.read.parquet(s["data_path"])
                .withColumn("_snapshot_id", F.lit(s["snapshot_id"]))
                .withColumn("_commit_ms", F.lit(s["committed_at_ms"]).cast("long"))
                .withColumn("_commit_seq", F.lit(seq).cast("int"))
            )
            out = d if out is None else out.unionByName(d)
        return out

    def read_asof(
        self, spark: SparkSession, commit_ms: int
    ) -> DataFrame | None:
        """Time travel: table state as of a commit timestamp — the
        Iceberg `TIMESTAMP AS OF` analog. Visible state is the union
        of snapshots whose manifest was published at or before
        `commit_ms`; later commits are invisible, exactly as a
        re-reader at that wall time would have seen it (manifests are
        immutable once published, so this is reproducible forever —
        until expire_snapshots drops history)."""
        snaps = [
            s for s in self.snapshots() if s["committed_at_ms"] <= commit_ms
        ]
        if not snaps:
            return None
        return spark.read.parquet(*[s["data_path"] for s in snaps])

    def expire_snapshots(self, keep_last: int) -> int:
        """Retention (B24 — src/ocr/queue.rs:1085-1098): drop all but
        the most recent `keep_last` snapshots. Manifest removal first
        (readers stop seeing it), then best-effort data cleanup."""
        import shutil

        snaps = self.snapshots()
        to_drop = snaps[: max(0, len(snaps) - keep_last)]
        for s in to_drop:
            os.remove(
                os.path.join(self.manifest_dir, "%s.json" % s["snapshot_id"])
            )
            shutil.rmtree(s["data_path"], ignore_errors=True)
        return len(to_drop)


# -- resume planning -------------------------------------------------------


def resume_plan(
    pages: DataFrame, store: SnapshotStore, key: str = "sha256"
) -> DataFrame:
    """Planned-minus-extracted anti-join (B23's Spark form): the pages
    still to process given the store's published snapshots.

    Default key is sha256 — content-level doneness, the reference's
    hash lookup (src/db/documents/crud.rs:117-134): under Skip dedup a
    duplicate url never appears in the output, but its *content* is
    committed, so url-keyed resume would replan it forever. Pass
    key='url' for POLICY_ALLOW pipelines where every url must appear.
    The done set is a slim projection; AQE broadcasts it when it fits."""
    done = store.read(pages.sparkSession)
    if done is None:
        return pages
    if key == "sha256":
        from readur_spark.operators.dedup import with_sha256

        pages = with_sha256(pages)
    return pages.join(done.select(key).distinct(), key, "left_anti")


def run_incremental(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore,
    extract_fn,
    run_id: str | None = None,
    meta: dict | None = None,
) -> tuple[str | None, DataFrame | None]:
    """One resumable increment: plan remaining work, extract, commit a
    snapshot. Returns (snapshot_id, extracted) — (None, None) when the
    plan is empty (everything already committed)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    todo = resume_plan(pages, store)
    if not todo.take(1):
        return None, None
    extracted = extract_fn(todo)
    snapshot_id = store.commit(extracted, run_id, meta=meta)
    return snapshot_id, store.read(spark)


# -- attempts ledger / requeue --------------------------------------------


def attempts_ledger(extracted_all: DataFrame) -> DataFrame:
    """Per-url attempt accounting derived from committed snapshots:
    attempts = times seen, last status by latest warc-commit order.
    Mirrors ocr_queue's (attempts, status) columns without a mutable
    queue table."""
    return extracted_all.groupBy("url").agg(
        F.count("*").alias("attempts"),
        F.max(F.when(F.col("status") == "completed", 1).otherwise(0)).alias(
            "_ever_completed"
        ),
    ).select(
        "url",
        "attempts",
        F.when(F.col("_ever_completed") == 1, "completed")
        .otherwise("failed")
        .alias("status"),
    )


def requeue_failed(
    pages: DataFrame,
    store: SnapshotStore,
    max_attempts: int = DEFAULT_MAX_ATTEMPTS,
) -> DataFrame:
    """B22 (src/ocr/queue.rs:978-1082) as one anti-join-free plan:
    pages whose url has only failed outcomes and attempts < max.
    The reference's NOT EXISTS (pending/processing) guard is
    unnecessary — batch runs have no concurrent claimants."""
    done = store.read(pages.sparkSession)
    if done is None:
        return pages.limit(0)
    ledger = attempts_ledger(done)
    eligible = ledger.filter(
        (F.col("status") == "failed") & (F.col("attempts") < max_attempts)
    ).select("url")
    return pages.join(eligible, "url", "left_semi")


def dead_letter(store: SnapshotStore, spark: SparkSession,
                max_attempts: int = DEFAULT_MAX_ATTEMPTS) -> DataFrame | None:
    """failed_documents analog (src/models/document.rs:142-192): urls
    that exhausted the attempts budget without ever completing, with
    their final failure classification — 'final' = the latest committed
    snapshot's row (max_by over commit order), deterministic across
    runs, not an arbitrary dropDuplicates survivor."""
    done = store.read_with_commit_order(spark)
    if done is None:
        return None
    ledger = attempts_ledger(done.drop("_snapshot_id", "_commit_ms", "_commit_seq"))
    exhausted = ledger.filter(
        (F.col("status") == "failed") & (F.col("attempts") >= max_attempts)
    ).select("url")
    latest_failure = (
        done.filter(F.col("status") == "failed")
        .join(exhausted, "url", "left_semi")
        .groupBy("url")
        .agg(
            F.max_by(
                F.struct("failure_reason", "failure_stage", "error"),
                F.col("_commit_seq"),
            ).alias("f")
        )
        .select(
            "url",
            F.col("f.failure_reason").alias("failure_reason"),
            F.col("f.failure_stage").alias("failure_stage"),
            F.col("f.error").alias("error"),
        )
    )
    return latest_failure


# -- lineage ---------------------------------------------------------------


def lineage_rows(extracted: DataFrame, run_id: str, snapshot_id: str) -> DataFrame:
    """Per-partition lineage (north_rule): which partition of which
    run/snapshot produced which url range, with counts — the
    processed_images-style audit trail (SURVEY.md §1.2) at partition
    granularity."""
    return extracted.groupBy("partition_id").agg(
        F.count("*").alias("n_docs"),
        F.min("url").alias("url_min"),
        F.max("url").alias("url_max"),
        F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias("n_failed"),
    ).select(
        F.lit(run_id).alias("run_id"),
        F.lit(snapshot_id).alias("snapshot_id"),
        "partition_id",
        "n_docs",
        "n_failed",
        "url_min",
        "url_max",
    )
