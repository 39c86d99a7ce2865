"""End-to-end golden test: the Spark pipeline must match the pure
kernels byte-identically per url (the north-rule invariant), and the
plumbing (dedup, metrics, partitioning) must behave."""

import pyarrow.parquet as pq
import pytest

from readur_spark import pipeline
from readur_spark.kernels.extract import extract_page
from readur_spark.operators import dedup as dedup_ops
from readur_spark.operators.extract import partition_metrics, with_relational_columns


@pytest.fixture(scope="module")
def extracted_rows(spark, pages_parquet):
    extracted, _metrics = pipeline.run(spark, pages_parquet, run_id="test")
    return {r["url"]: r.asDict() for r in extracted.collect()}


@pytest.fixture(scope="module")
def golden(pages_parquet):
    """Kernel-computed expected output per url (dedup-skip winners)."""
    table = pq.read_table(pages_parquet)
    rows = table.to_pylist()
    # dedup: first (warc_ts, url) per payload sha
    import hashlib

    best = {}
    for r in rows:
        payload = bytes(r["html"]) if r["html"] is not None else b""
        h = hashlib.sha256(payload).hexdigest()
        key = (r["warc_ts"], r["url"])
        if h not in best or key < best[h][0]:
            best[h] = (key, r)
    out = {}
    for _h, (_k, r) in best.items():
        payload = bytes(r["html"]) if r["html"] is not None else b""
        out[r["url"]] = extract_page(r["url"], payload)
    return out


def test_dedup_matches_golden_winner_set(extracted_rows, golden):
    assert set(extracted_rows) == set(golden)


def test_byte_identical_text_per_url(extracted_rows, golden):
    mismatches = []
    for url, g in golden.items():
        s = extracted_rows[url]
        if s["extracted_text"] != g.extracted_text:
            mismatches.append(url)
    assert not mismatches, "text mismatch for %d urls, e.g. %s" % (
        len(mismatches),
        mismatches[:3],
    )


def test_status_confidence_wordcount_match(extracted_rows, golden):
    for url, g in golden.items():
        s = extracted_rows[url]
        assert s["status"] == g.status, url
        assert s["word_count"] == g.word_count, url
        if g.confidence is None:
            assert s["confidence"] is None, url
        else:
            assert abs(s["confidence"] - g.confidence) < 1e-6, url
        assert s["failure_reason"] == g.failure_reason, url


def test_all_branches_present(extracted_rows):
    confs = {r["confidence"] for r in extracted_rows.values() if r["confidence"]}
    assert {100.0, 95.0, 90.0}.issubset(confs)
    reasons = {r["failure_reason"] for r in extracted_rows.values() if r["failure_reason"]}
    assert "unsupported_format" in reasons


def test_sha256_passthrough_matches(extracted_rows, pages_parquet):
    import hashlib

    table = pq.read_table(pages_parquet).to_pylist()
    by_url = {r["url"]: r for r in table}
    for url, row in list(extracted_rows.items())[:50]:
        payload = bytes(by_url[url]["html"]) if by_url[url]["html"] is not None else b""
        assert row["sha256"] == hashlib.sha256(payload).hexdigest()


def test_metrics_rows(spark, pages_parquet):
    extracted, metrics = pipeline.run(spark, pages_parquet, run_id="m1")
    m = metrics.collect()
    assert len(m) >= 1
    total = sum(r["n_docs"] for r in m)
    assert total == extracted.count()
    for r in m:
        assert r["n_docs"] == r["n_completed"] + r["n_failed"]
        assert r["docs_per_sec"] > 0


def test_track_policy_keeps_all_rows(spark, pages_parquet):
    pages = with_relational_columns(spark.read.parquet(pages_parquet))
    tracked = dedup_ops.dedup_track(pages)
    assert tracked.count() == pages.count()
    dups = tracked.filter("is_duplicate").count()
    assert dups > 0


def test_dedup_against_existing(spark, pages_parquet):
    pages = with_relational_columns(spark.read.parquet(pages_parquet))
    first_half = pages.limit(200)
    remaining = dedup_ops.dedup_against_existing(pages, first_half)
    assert remaining.count() < pages.count()
    # no remaining sha256 appears in the existing set
    inter = remaining.select("sha256").intersect(first_half.select("sha256"))
    assert inter.count() == 0


def test_extraction_plan_shape(spark, pages_parquet):
    """The flagship DAG must contain exactly one shuffle pair before the
    Python stage (dedup agg+join) plus the explicit repartition — and
    the parquet scan must prune columns."""
    extracted, _ = pipeline.run(spark, pages_parquet, run_id="p1")
    plan = extracted._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan
    scan_plan = plan[plan.index("Scan parquet") :] if "Scan parquet" in plan else plan
    # column pruning: text/lang never read
    assert "text" not in scan_plan.split("ReadSchema:")[-1][:400]


class TestIgnoredFiles:
    """is_file_ignored parity (db/ignored_files.rs:343-361): hash-only
    and hash+source matching shapes."""

    def _pages(self, spark):
        from pyspark.sql import Row

        return spark.createDataFrame([
            Row(url="u1", html=b"aaa", source_type="webdav", source_path="/a"),
            Row(url="u2", html=b"bbb", source_type="webdav", source_path="/b"),
            Row(url="u3", html=b"aaa", source_type="s3", source_path="/c"),
        ])

    def test_hash_only_match_ignores_everywhere(self, spark):
        import hashlib

        from pyspark.sql import Row

        from readur_spark.operators.dedup import filter_ignored

        h_aaa = hashlib.sha256(b"aaa").hexdigest()
        ignored = spark.createDataFrame([Row(sha256=h_aaa)])
        kept = {r["url"] for r in filter_ignored(self._pages(spark), ignored).collect()}
        # both copies of 'aaa' are gone regardless of source
        assert kept == {"u2"}

    def test_source_scoped_match_only_hits_that_source(self, spark):
        import hashlib

        from pyspark.sql import Row

        from readur_spark.operators.dedup import filter_ignored

        h_aaa = hashlib.sha256(b"aaa").hexdigest()
        ignored = spark.createDataFrame(
            [Row(sha256=h_aaa, source_type="webdav", source_path="/a")]
        )
        kept = {
            r["url"]
            for r in filter_ignored(
                self._pages(spark), ignored, by_source=True
            ).collect()
        }
        # the same content from s3 survives; only the webdav copy is gated
        assert kept == {"u2", "u3"}
