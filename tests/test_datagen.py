"""Determinism and coverage of the synthetic page corpus (FIXTURES.md §1)."""

from readur_spark import datagen
from readur_spark.kernels.extract import extract_page


def test_deterministic():
    a = datagen.generate_pages(200, seed=42)
    b = datagen.generate_pages(200, seed=42)
    assert a.equals(b)


def test_seed_changes_output():
    a = datagen.generate_pages(100, seed=42)
    b = datagen.generate_pages(100, seed=43)
    assert not a.equals(b)


def test_kind_coverage_and_branches():
    table = datagen.generate_pages(500, seed=42)
    rows = table.to_pylist()
    assert len(rows) >= 500
    urls = [r["url"] for r in rows]
    assert len(set(urls)) == len(urls), "urls must be unique"

    kinds_seen = set()
    for r in rows:
        for kind in ("text", "pdf_text", "pdf_junk_prefix", "pdf_image_based",
                     "pdf_corrupted", "png", "html", "zip", "empty", "jpeg_header",
                     "dup", "big"):
            if "/%s/" % kind in r["url"] or "/%s" % kind in r["url"].rsplit("/", 2)[1:2]:
                kinds_seen.add(kind)
    for kind in ("text", "pdf_text", "png", "html", "zip", "empty"):
        assert kind in kinds_seen, "missing kind %s" % kind

    # duplicates exist
    payloads = [bytes(r["html"]) for r in rows if r["html"]]
    assert len(payloads) != len(set(payloads)), "expected exact duplicates"


def test_extraction_covers_statuses():
    table = datagen.generate_pages(300, seed=42)
    statuses, reasons, confs = set(), set(), set()
    for r in table.to_pylist():
        res = extract_page(r["url"], bytes(r["html"]) if r["html"] is not None else b"")
        statuses.add(res.status)
        if res.failure_reason:
            reasons.add(res.failure_reason)
        if res.confidence is not None:
            confs.add(res.confidence)
    assert statuses == {"completed", "failed"}
    assert "unsupported_format" in reasons
    assert "low_ocr_confidence" in reasons
    assert 100.0 in confs  # text
    assert 95.0 in confs  # pdf quick
    assert 90.0 in confs  # html


def test_text_rows_byte_identical_to_text_column():
    table = datagen.generate_pages(300, seed=42)
    n_checked = 0
    for r in table.to_pylist():
        if r["text"] is None or "/text/" not in r["url"]:
            continue
        res = extract_page(r["url"], bytes(r["html"]))
        assert res.status == "completed"
        # A30: extracted text == trim(text column) byte-identically
        assert res.extracted_text == r["text"].strip()
        n_checked += 1
    assert n_checked > 50
