"""Snapshot store, resume planning, attempts ledger, dead letter.

Mirrors the reference's integration themes: resumable processing
(stale recovery src/ocr/queue.rs:1101-1121), requeue-behind-attempts
(src/ocr/queue.rs:978-1082), dead-letter accounting
(integration_failed_documents_tests.rs).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from readur_spark.operators import checkpoint as cp
from readur_spark.pipeline import extract_corpus


@pytest.fixture()
def pages(spark):
    from readur_spark.corpus import synthetic_pages

    return synthetic_pages(spark, 300)


def _extract(df):
    return extract_corpus(df)


def test_commit_then_read_roundtrip(spark, tmp_path, pages):
    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    assert store.is_empty()
    extracted = _extract(pages)
    sid = store.commit(extracted, run_id="r1")
    assert not store.is_empty()
    got = store.read(spark)
    assert got.count() == extracted.count()
    assert [s["snapshot_id"] for s in store.snapshots()] == [sid]


def test_unpublished_snapshot_invisible(spark, tmp_path, pages):
    """A crashed run's data dir without a manifest must not be read —
    the snapshot-atomicity contract."""
    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    extracted = _extract(pages).limit(10)
    # simulate a crash: data written, manifest never published
    extracted.write.parquet(os.path.join(store.snap_dir, "orphan-123"))
    assert store.is_empty()
    assert store.read(spark) is None


def test_resume_plan_excludes_committed(spark, tmp_path, pages):
    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    first_half = pages.filter(F.xxhash64("url") % 2 == 0)
    store.commit(_extract(first_half), run_id="r1")

    todo = cp.resume_plan(pages, store)
    done_urls = {r.url for r in store.read(spark).select("url").collect()}
    todo_urls = {r.url for r in todo.select("url").collect()}
    assert todo_urls.isdisjoint(done_urls)
    # content-level coverage: every payload hash is either committed
    # or planned (duplicate urls of committed content are neither)
    from readur_spark.operators.dedup import with_sha256

    all_hashes = {r.sha256 for r in with_sha256(pages).select("sha256").collect()}
    done_hashes = {r.sha256 for r in store.read(spark).select("sha256").collect()}
    todo_hashes = {
        r.sha256 for r in with_sha256(todo.drop("sha256")).select("sha256").collect()
    }
    assert todo_hashes.isdisjoint(done_hashes)
    assert done_hashes | todo_hashes == all_hashes


def test_run_incremental_converges_and_is_idempotent(spark, tmp_path, pages):
    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    n_expected = _extract(pages).count()

    sid1, state1 = cp.run_incremental(spark, pages, store, _extract, run_id="r1")
    assert sid1 is not None
    c1 = state1.count()
    assert c1 == n_expected

    # second run: nothing left → no new snapshot, state unchanged
    sid2, state2 = cp.run_incremental(spark, pages, store, _extract, run_id="r2")
    assert sid2 is None and state2 is None
    assert store.read(spark).count() == c1
    assert len(store.snapshots()) == 1


def test_kill_resume_two_phase(spark, tmp_path, pages):
    """Phase 1 commits a partial snapshot (simulating a run that died
    after one commit); phase 2 resumes and completes exactly the rest."""
    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    part1 = pages.limit(120)
    store.commit(_extract(part1), run_id="r1")
    n_after_1 = store.read(spark).count()

    sid, state = cp.run_incremental(spark, pages, store, _extract, run_id="r2")
    assert sid is not None
    total = state.count()
    assert total == _extract(pages).count()
    # no url extracted twice across snapshots
    dupes = (
        store.read(spark).groupBy("url").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0
    assert total > n_after_1


def test_requeue_failed_respects_attempts_budget(spark, tmp_path, pages):
    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    extracted = _extract(pages)
    store.commit(extracted, run_id="r1")

    failed_urls = {r.url for r in extracted.filter("status='failed'").select("url").collect()}
    if not failed_urls:
        pytest.skip("corpus produced no failures")

    todo = cp.requeue_failed(pages, store, max_attempts=3)
    todo_urls = {r.url for r in todo.select("url").collect()}
    assert todo_urls == failed_urls

    # after 3 committed attempts the urls drop out of requeue…
    store.commit(extracted.filter("status='failed'"), run_id="r2")
    store.commit(extracted.filter("status='failed'"), run_id="r3")
    assert cp.requeue_failed(pages, store, max_attempts=3).count() == 0

    # …and show up in the dead letter with their classification
    dl = cp.dead_letter(store, spark, max_attempts=3)
    dl_urls = {r.url for r in dl.select("url").collect()}
    assert dl_urls == failed_urls
    assert dl.filter(F.col("failure_reason").isNull()).count() == 0


def test_dead_letter_reports_latest_attempts_classification(spark, tmp_path):
    """The 'final failure classification' must be the LATEST committed
    snapshot's row (max_by over commit order) — not an arbitrary
    survivor of an unordered dropDuplicates."""
    store = cp.SnapshotStore(str(tmp_path / "dl"))
    schema = "url string, status string, failure_reason string, failure_stage string, error string"

    def attempt(reason, stage, error):
        return spark.createDataFrame(
            [("https://x.example/doc", "failed", reason, stage, error)], schema
        )

    store.commit(attempt("pdf_parsing_error", "ocr", "attempt 1"), run_id="r1")
    store.commit(attempt("timeout", "ocr", "attempt 2"), run_id="r2")
    store.commit(attempt("low_ocr_confidence", "validation", "attempt 3"), run_id="r3")

    dl = cp.dead_letter(store, spark, max_attempts=3).collect()
    assert len(dl) == 1
    row = dl[0]
    assert row.failure_reason == "low_ocr_confidence"
    assert row.failure_stage == "validation"
    assert row.error == "attempt 3"


def test_bucketed_commit_layout_and_pruning(spark, tmp_path, pages):
    """url-hash bucketed snapshots: correct layout, readable union,
    and a bucket-keyed filter prunes the scan to one directory."""
    import glob

    from readur_spark.plans import explain_str

    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    extracted = _extract(pages)
    sid = store.commit(extracted, run_id="r1", url_buckets=8)
    dirs = glob.glob(os.path.join(store.snap_dir, sid, "url_bucket=*"))
    assert 1 < len(dirs) <= 8
    got = store.read(spark)
    assert got.count() == extracted.count()
    # partition pruning: filtering one bucket reads one partition dir
    one = got.filter(F.col("url_bucket") == 3)
    plan = explain_str(one)
    assert "url_bucket" in plan
    n_all = got.count()
    n_one = one.count()
    assert 0 < n_one < n_all


def test_expire_snapshots(spark, tmp_path, pages):
    store = cp.SnapshotStore(str(tmp_path / "extracted"))
    e = _extract(pages).limit(5)
    for i in range(4):
        store.commit(e, run_id="r%d" % i)
    dropped = store.expire_snapshots(keep_last=2)
    assert dropped == 2
    assert len(store.snapshots()) == 2
    assert store.read(spark).count() == 10


def test_lineage_rows(spark, tmp_path, pages):
    extracted = _extract(pages)
    lin = cp.lineage_rows(extracted, "r1", "snap1")
    rows = lin.collect()
    assert sum(r.n_docs for r in rows) == extracted.count()
    assert all(r.run_id == "r1" and r.snapshot_id == "snap1" for r in rows)
    assert all(r.url_min <= r.url_max for r in rows)


def test_read_asof_time_travel(spark, tmp_path, pages):
    store = cp.SnapshotStore(str(tmp_path / "tt"))
    first = _extract(pages.limit(100))
    store.commit(first, run_id="tt-1")
    t_between = store.snapshots()[-1]["committed_at_ms"]
    second = _extract(pages.limit(150)).filter(F.col("url").isNotNull())
    store.commit(second, run_id="tt-2")

    # as-of the first commit: only its rows are visible
    asof = store.read_asof(spark, t_between)
    assert asof.count() == first.count()
    # as-of now: both snapshots
    now_ms = store.snapshots()[-1]["committed_at_ms"]
    assert store.read_asof(spark, now_ms).count() == first.count() + second.count()
    # before any commit: no table state
    assert store.read_asof(spark, t_between - 10_000) is None
