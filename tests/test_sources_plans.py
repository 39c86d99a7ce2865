"""WARC source round-trips and physical-plan audits."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from readur_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_no_shuffle,
    pushed_filters,
    scan_columns,
    shuffle_count,
)
from readur_spark.sources.warc import parse_warc_bytes, read_warc_pages, write_warc

ROWS = [
    ("https://a.example/x.html", "2024-01-01T00:00:00Z", b"<html><body><p>hello world one</p></body></html>"),
    ("https://b.example/y.txt", "2024-01-02T12:30:00Z", b"plain text body"),
    ("https://a.example/z.html", "2024-01-03T06:00:00Z", "café naïve".encode("utf-8")),
]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip_bytes(compress):
    data = write_warc(ROWS, compress=compress)
    rows = parse_warc_bytes(data)
    assert [(r["url"], bytes(r["html"])) for r in rows] == [
        (u, b) for u, _, b in ROWS
    ]
    assert rows[0]["warc_ts"].isoformat().startswith("2024-01-01T00:00:00")


def test_warc_tolerates_truncation():
    data = write_warc(ROWS)
    rows = parse_warc_bytes(data[: len(data) - 30])  # cut mid-record
    assert 0 < len(rows) <= len(ROWS)  # no exception, prefix parsed


def test_read_warc_pages_spark(spark, tmp_path):
    p1 = tmp_path / "a.warc"
    p2 = tmp_path / "b.warc.gz"
    p1.write_bytes(write_warc(ROWS[:2]))
    p2.write_bytes(write_warc(ROWS[2:], compress=True))

    df = read_warc_pages(spark, str(tmp_path))
    got = {r.url: r for r in df.collect()}
    assert set(got) == {u for u, _, _ in ROWS}
    assert bytes(got["https://b.example/y.txt"].html) == b"plain text body"
    assert got["https://a.example/x.html"].warc_ts is not None

    # and it feeds the pipeline directly
    from readur_spark.pipeline import extract_corpus

    extracted = {r.url: r for r in extract_corpus(df).collect()}
    assert extracted["https://b.example/y.txt"].extracted_text == "plain text body"


def test_read_warc_pages_dedupes_recrawled_uris(spark, tmp_path):
    """WARC archives carry one record per capture; the pages table is
    keyed by url (input_hint). Recrawls — within one archive and across
    archives — must collapse to the LATEST capture, and dedup_skip on
    the result must not resurrect stale content."""
    old = ("https://r.example/page.html", "2024-01-01T00:00:00Z", b"old content v1")
    mid = ("https://r.example/page.html", "2024-02-01T00:00:00Z", b"mid content v2")
    new = ("https://r.example/page.html", "2024-03-01T00:00:00Z", b"new content v3")
    other = ("https://r.example/other.txt", "2024-01-05T00:00:00Z", b"other body")
    (tmp_path / "c1.warc").write_bytes(write_warc([old, mid, other]))
    (tmp_path / "c2.warc").write_bytes(write_warc([new]))

    df = read_warc_pages(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 2  # one per url
    got = {r.url: bytes(r.html) for r in rows}
    assert got["https://r.example/page.html"] == b"new content v3"
    assert got["https://r.example/other.txt"] == b"other body"

    # raw captures remain reachable for archaeology
    raw = read_warc_pages(spark, str(tmp_path), unique_urls=False)
    assert raw.count() == 4

    # dedup_skip over the canonicalized frame keeps exactly these rows
    from readur_spark.operators.dedup import dedup_skip

    assert dedup_skip(df).count() == 2


def test_dedup_skip_repeated_url_different_content(spark):
    """A repeated url with DIFFERENT payloads (un-canonicalized ingest)
    must not let both rows survive via a shared winner url — the
    (sha256, url) composite semi-join keeps one row per content hash."""
    from readur_spark.operators.dedup import dedup_skip, with_sha256

    rows = [
        ("https://d.example/p", "2024-01-01 00:00:00", b"v1"),
        ("https://d.example/p", "2024-01-02 00:00:00", b"v2"),
        ("https://d.example/q", "2024-01-03 00:00:00", b"v1"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string, html binary") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    out = dedup_skip(with_sha256(df)).collect()
    # v1 wins at its earliest (ts, url) = the /p capture; v2 survives as
    # distinct content; the /q copy of v1 is a duplicate → dropped
    kept = {(r.url, bytes(r.html)) for r in out}
    assert kept == {
        ("https://d.example/p", b"v1"),
        ("https://d.example/p", b"v2"),
    }


def test_plan_pushdown_and_pruning(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    q = docs.filter(F.col("n_chars") > 100).select("doc_id", "lang")
    pf = pushed_filters(q)
    assert any("n_chars" in f for f in pf), pf
    cols = scan_columns(q)
    assert cols and set(cols[0]) <= {"doc_id", "lang", "n_chars"}, cols


def test_plan_narrow_extraction_no_shuffle(spark, sf_dir):
    """POLICY_ALLOW extraction must stay a scan→UDF narrow pipeline."""
    from readur_spark.corpus import pages_from_documents
    from readur_spark.operators import dedup as dd
    from readur_spark.pipeline import extract_corpus

    pages = pages_from_documents(spark, sf_dir)
    extracted = extract_corpus(pages, dedup_policy=dd.POLICY_ALLOW)
    assert shuffle_count(extracted) == 0


def test_plan_flagship_single_extraction_pass(spark, sf_dir):
    """The dedup'd pipeline must run MapInPandas exactly once — the
    winner-selection subtree is JVM-only. (Regression: the post-stage
    lazy plan re-executed the whole extraction for the winner agg.)"""
    from readur_spark.corpus import pages_from_documents
    from readur_spark.pipeline import extract_corpus
    from readur_spark.plans import explain_str

    pages = pages_from_documents(spark, sf_dir)
    # simple mode: one line per operator (formatted repeats each node
    # in the detail section)
    plan = explain_str(extract_corpus(pages), mode="simple")
    assert plan.count("MapInPandas") == 1, plan


def test_plan_label_join_broadcasts(spark, sf_dir):
    """The labels-style dimension join (B18) must broadcast."""
    from readur_spark.queries.registry import queries

    df = queries()["label_join_counts"](spark, sf_dir)
    assert has_broadcast_join(df)


def test_plan_curation_projections_no_shuffle(spark, sf_dir):
    """The per-document curation gates must stay pure projections —
    zero exchanges — so at 10^12 rows they ride the scan."""
    from readur_spark.ml.webfilters import (
        pii_redaction,
        qc_web_filters,
        split_hash_sample,
    )
    from readur_spark.queries.crawl import url_canonicalize

    for q in (qc_web_filters, split_hash_sample, url_canonicalize, pii_redaction):
        df = q(spark, sf_dir)
        assert has_no_shuffle(df), (q.__name__, explain_str(df)[:800])


def test_plan_decontamination_broadcasts_eval_set(spark, sf_dir):
    """The eval shingle set must broadcast — a shuffled join here would
    re-partition the whole corpus by shingle."""
    from readur_spark.ml.decontam import decontaminate_overlap

    df = decontaminate_overlap(spark, sf_dir)
    assert has_broadcast_join(df), explain_str(df)[:800]


def test_plan_tfidf_broadcasts_df_stats(spark, sf_dir):
    from readur_spark.queries.search import search_tfidf_postings

    df = search_tfidf_postings(spark, sf_dir)
    assert has_broadcast_join(df), explain_str(df)[:800]


def test_plan_chunking_no_shuffle(spark, sf_dir):
    from readur_spark.ml.packing import chunk_for_embedding

    df = chunk_for_embedding(spark, sf_dir)
    assert has_no_shuffle(df), explain_str(df)[:800]


def test_plan_yield_report_broadcasts_and_bounds_shuffles(spark, sf_dir):
    """Composed curation chain: contamination eval set must broadcast;
    total shuffles stay at the four narrow-keyed ones (partition-floor
    repartition of the slim kept slice, eval distinct, per-doc
    contamination agg, final rollup)."""
    from readur_spark.ml.curation import training_yield_report

    df = training_yield_report(spark, sf_dir)
    assert has_broadcast_join(df), explain_str(df)[:800]
    assert shuffle_count(df) <= 4, explain_str(df)[:800]


def test_plan_script_detect_no_shuffle(spark, sf_dir):
    from readur_spark.ml.textqc import qc_script_detect

    df = qc_script_detect(spark, sf_dir)
    assert has_no_shuffle(df), explain_str(df)[:800]


class TestWetEmission:
    WET_ROWS = [
        ("https://a.example/1", "2024-01-01T00:00:00Z", "hello wet world"),
        ("https://b.example/2", "2024-02-03T04:05:06Z", "café naïve — text"),
    ]

    def test_record_framing_and_roundtrip(self):
        from readur_spark.sources.warc import parse_wet_bytes, wet_record_bytes

        recs = b"".join(
            wet_record_bytes(u, ts, t) for u, ts, t in self.WET_ROWS
        )
        rows = parse_wet_bytes(recs)
        assert [(r["url"], r["text"]) for r in rows] == [
            (u, t) for u, ts, t in self.WET_ROWS
        ]
        assert rows[1]["warc_ts"].isoformat().startswith("2024-02-03T04:05:06")

    def test_members_concatenate_and_are_deterministic(self):
        from readur_spark.sources.warc import parse_wet_bytes, wet_member_bytes

        members = [wet_member_bytes(u, ts, t) for u, ts, t in self.WET_ROWS]
        # gzip member concatenation == valid multi-member WET file
        rows = parse_wet_bytes(b"".join(members))
        assert [r["url"] for r in rows] == [u for u, _, _ in self.WET_ROWS]
        # byte-reproducible (mtime pinned, content-addressed record id)
        again = [wet_member_bytes(u, ts, t) for u, ts, t in self.WET_ROWS]
        assert members == again

    def test_block_digest_matches_spec(self):
        import base64
        import hashlib

        from readur_spark.sources.warc import wet_record_bytes

        rec = wet_record_bytes("https://a.example/1", "2024-01-01T00:00:00Z", "xyz")
        want = base64.b32encode(hashlib.sha1(b"xyz").digest()).decode()
        assert f"WARC-Block-Digest: sha1:{want}".encode() in rec

    def test_spark_members_roundtrip(self, spark):
        from readur_spark.sources.warc import parse_wet_bytes, wet_members

        df = spark.createDataFrame(
            [
                (u, ts.replace("Z", ""), t)
                for u, ts, t in self.WET_ROWS
            ],
            "url string, warc_ts string, extracted_text string",
        ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
        got = {r["url"]: bytes(r["wet"]) for r in wet_members(df).collect()}
        assert set(got) == {u for u, _, _ in self.WET_ROWS}
        parsed = parse_wet_bytes(b"".join(got[u] for u, _, _ in self.WET_ROWS))
        assert [(r["url"], r["text"]) for r in parsed] == [
            (u, t) for u, ts, t in self.WET_ROWS
        ]

    def test_null_timestamp_falls_back_to_epoch(self, spark):
        """ADVICE r4: a null warc_ts arrives in pandas as NaT (not
        None); the member must fall back to the documented epoch date
        instead of the Arrow task dying in strftime."""
        from readur_spark.sources.warc import parse_wet_bytes, wet_members

        df = spark.createDataFrame(
            [("https://a.example/null-ts", None, "body text")],
            "url string, warc_ts timestamp, extracted_text string",
        )
        rows = wet_members(df).collect()
        assert len(rows) == 1
        member = bytes(rows[0]["wet"])
        assert b"WARC-Date: 1970-01-01T00:00:00Z" in __import__(
            "gzip"
        ).decompress(member)
        parsed = parse_wet_bytes(member)
        assert parsed[0]["url"] == "https://a.example/null-ts"
        assert parsed[0]["text"] == "body text"
