"""Structured-Streaming watcher: incremental discovery, dedup against
the store, idempotent per-batch snapshot commits.

Mirrors the reference's watcher/sync themes
(src/scheduling/watcher.rs, startup sync src/main.rs:289-310).
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq

from readur_spark.datagen import generate_pages
from readur_spark.operators.checkpoint import SnapshotStore
from readur_spark.streaming import stream_extract


def _write_slice(table, lo, hi, path):
    pq.write_table(table.slice(lo, hi - lo), path)


def test_available_now_catchup_then_incremental(spark, tmp_path):
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    store = SnapshotStore(str(tmp_path / "extracted"))
    ckpt = str(tmp_path / "ckpt")

    corpus = generate_pages(200, seed=7)

    # backlog: two files present before the stream starts
    _write_slice(corpus, 0, 80, os.path.join(input_dir, "a.parquet"))
    _write_slice(corpus, 80, 140, os.path.join(input_dir, "b.parquet"))

    q = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    q.awaitTermination(300)
    n_after_backlog = store.read(spark).count()
    assert n_after_backlog > 0

    # new file lands; a fresh available-now pass picks up ONLY it
    _write_slice(corpus, 140, 200, os.path.join(input_dir, "c.parquet"))
    q2 = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    q2.awaitTermination(300)
    n_after_inc = store.read(spark).count()
    assert n_after_inc > n_after_backlog

    # no content extracted twice (content-hash level)
    dupes = (
        store.read(spark).groupBy("sha256").count().filter("count > 1").count()
    )
    assert dupes == 0


def test_restart_replay_is_idempotent(spark, tmp_path):
    """Wiping the streaming checkpoint forces a full replay; manifest
    keying by batch id + content dedup must keep the store unchanged."""
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    store = SnapshotStore(str(tmp_path / "extracted"))
    ckpt = str(tmp_path / "ckpt")

    corpus = generate_pages(120, seed=9)
    _write_slice(corpus, 0, 120, os.path.join(input_dir, "a.parquet"))

    q = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    q.awaitTermination(300)
    n1 = store.read(spark).count()
    snaps1 = len(store.snapshots())

    # simulate losing the streaming checkpoint (worst-case restart)
    shutil.rmtree(ckpt)
    q2 = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    q2.awaitTermination(300)

    assert store.read(spark).count() == n1
    # replay may publish an empty-free snapshot only if batch ids
    # differ; content dedup guarantees zero duplicate rows either way
    dupes = (
        store.read(spark).groupBy("sha256").count().filter("count > 1").count()
    )
    assert dupes == 0
    assert len(store.snapshots()) >= snaps1


def test_stream_curate_gates_and_appends(spark, tmp_path):
    """Extract a corpus (batch), then stream-curate its output into a
    shard layout; a second stream run over the same input appends
    nothing (idempotent layout)."""
    import glob

    from readur_spark.pipeline import extract_corpus
    from readur_spark.streaming.ingest import stream_curate

    from readur_spark.corpus import synthetic_pages

    src = str(tmp_path / "extracted_in")
    extract_corpus(synthetic_pages(spark, 120)).write.parquet(src)

    out = str(tmp_path / "shards_out")
    q = stream_curate(
        spark, src, out, str(tmp_path / "ck1"), min_words=5,
    )
    q.awaitTermination(300)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 > 0
    assert glob.glob(out + "/split=*")
    assert set(first.columns) >= {"url", "text", "n_words"}

    q2 = stream_curate(
        spark, src, out, str(tmp_path / "ck2"), min_words=5,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(out).count() == n1


def test_kill_mid_batch_before_commit_then_resume(spark, tmp_path, monkeypatch):
    """Streaming kill/resume, crash BEFORE the snapshot commit: the
    injected fault kills the query mid-batch, the streaming checkpoint
    never acknowledges the batch, and the restart replays it to exactly
    one committed snapshot — the streaming twin of the batch
    kill/resume test in test_checkpoint.py."""
    from readur_spark.streaming import ingest as ingest_mod

    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    store = SnapshotStore(str(tmp_path / "extracted"))
    ckpt = str(tmp_path / "ckpt")
    corpus = generate_pages(100, seed=11)
    _write_slice(corpus, 0, 100, os.path.join(input_dir, "a.parquet"))

    real = ingest_mod.extract_corpus
    calls = {"n": 0}

    def flaky(df, settings=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected mid-batch crash")
        return real(df, settings)

    monkeypatch.setattr(ingest_mod, "extract_corpus", flaky)

    q = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    try:
        q.awaitTermination(300)
    except Exception:
        pass  # the injected crash surfaces as StreamingQueryException
    assert store.is_empty()  # nothing half-committed is visible

    q2 = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert calls["n"] >= 2
    done = store.read(spark)
    assert done is not None and done.count() > 0
    assert done.groupBy("sha256").count().filter("count > 1").count() == 0
    assert len(store.snapshots()) == 1


def test_kill_after_commit_before_ack_skips_on_replay(spark, tmp_path):
    """Crash AFTER the snapshot commit but BEFORE the streaming
    checkpoint acknowledges the batch: the replayed batch finds its
    manifest (commits are keyed by batch id) and skips — exactly one
    snapshot, no duplicate rows."""
    input_dir = str(tmp_path / "incoming")
    os.makedirs(input_dir)
    ckpt = str(tmp_path / "ckpt")
    corpus = generate_pages(80, seed=13)
    _write_slice(corpus, 0, 80, os.path.join(input_dir, "a.parquet"))

    class CrashAfterCommitStore(SnapshotStore):
        def __init__(self, root):
            super().__init__(root)
            self.crashes_left = 1

        def commit(self, df, run_id, meta=None, url_buckets=None):
            sid = super().commit(df, run_id, meta=meta, url_buckets=url_buckets)
            if self.crashes_left:
                self.crashes_left -= 1
                raise RuntimeError("injected crash after commit")
            return sid

    store = CrashAfterCommitStore(str(tmp_path / "extracted"))
    q = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    try:
        q.awaitTermination(300)
    except Exception:
        pass
    # the commit itself landed (manifest published before the crash)
    assert len(store.snapshots()) == 1
    n1 = store.read(spark).count()

    q2 = stream_extract(spark, input_dir, store, ckpt, available_now=True)
    q2.awaitTermination(300)
    assert len(store.snapshots()) == 1  # replay skipped, no second commit
    assert store.read(spark).count() == n1
    assert (
        store.read(spark).groupBy("sha256").count().filter("count > 1").count()
        == 0
    )


def test_stream_curate_hygiene_stages(spark, tmp_path):
    """The stateless round-3 hygiene flags work in the watcher: a
    blocked host never reaches the layout, and line-filtered text
    drops non-sentence lines."""
    from readur_spark.pipeline import extract_corpus
    from readur_spark.streaming.ingest import stream_curate

    from readur_spark.corpus import synthetic_pages

    src = str(tmp_path / "hx_in")
    extract_corpus(synthetic_pages(spark, 120)).write.parquet(src)

    out = str(tmp_path / "hx_out")
    q = stream_curate(
        spark, src, out, str(tmp_path / "hx_ck"), min_words=5,
        url_gates=True, blocked_domains=["host0.example"],
        nfc=True, line_filter=True,
    )
    q.awaitTermination(300)
    from pyspark.sql import functions as F

    written = spark.read.parquet(out)
    assert written.count() > 0
    assert written.filter(
        F.col("url").contains("//host0.example/")
    ).count() == 0
