"""Property-based robustness: no payload may ever raise out of a
kernel — at 10^12 documents every malformed blob must become a
classified failure row, not a dead executor.

Mirrors the reference's stance: extraction errors are caught, classified
(src/ocr/queue.rs:1193-1215) and recorded in failed_documents; the
worker loop never dies on one document.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from readur_spark.kernels.extract import extract_page
from readur_spark.kernels.html_extract import extract_main_content
from readur_spark.kernels.mime import detect_mime
from readur_spark.kernels.pdf import (
    extract_pdf_metadata,
    extract_text_from_pdf_bytes,
    parse_pdf_text_layer,
)
from readur_spark.kernels.snippets import generate_snippets
from readur_spark.kernels.text import count_words_in_text
from readur_spark.sources.warc import parse_warc_bytes

STATUSES = {"completed", "failed"}

binary = st.binary(max_size=4096)
text = st.text(max_size=2048)


@settings(max_examples=300, deadline=None)
@given(binary)
def test_extract_page_total_on_arbitrary_bytes(data):
    r = extract_page("https://fuzz.example/doc.bin", data)
    assert r.status in STATUSES
    if r.status == "failed":
        assert r.failure_reason is not None


@settings(max_examples=200, deadline=None)
@given(binary, st.sampled_from(["txt", "pdf", "html", "png", "jpg", "zip"]))
def test_extract_page_total_per_extension(data, ext):
    r = extract_page("https://fuzz.example/doc.%s" % ext, data)
    assert r.status in STATUSES


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=4096).map(lambda b: b"%PDF-1.4\n" + b))
def test_pdf_kernels_total(data):
    parse_pdf_text_layer(data)
    extract_text_from_pdf_bytes(data)
    meta = extract_pdf_metadata(data)
    assert meta.get("pdf_version") is not None


@settings(max_examples=200, deadline=None)
@given(text)
def test_html_extractor_total(t):
    out = extract_main_content("<html><body>" + t + "</body></html>")
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(binary)
def test_mime_detection_total(data):
    mime, conf, method = detect_mime(data, "fuzz.bin")
    assert isinstance(mime, str) and mime
    assert conf in ("low", "medium", "high", "very_high")


@settings(max_examples=200, deadline=None)
@given(binary)
def test_warc_parser_total(data):
    rows = parse_warc_bytes(data)
    assert isinstance(rows, list)


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_warc_truncation_prefix_safe(data):
    from readur_spark.sources.warc import write_warc

    full = write_warc([("https://x/y", "2024-01-01T00:00:00Z", data)])
    for cut in (1, len(full) // 3, len(full) - 1):
        rows = parse_warc_bytes(full[:cut])
        assert isinstance(rows, list)


@settings(max_examples=200, deadline=None)
@given(text, st.text(min_size=1, max_size=20))
def test_snippets_offsets_in_bounds(t, q):
    for s in generate_snippets([("content", t)], q, 60):
        assert 0 <= s.start_offset <= s.end_offset <= len(t)
        for hs, he in s.highlight_ranges:
            assert 0 <= hs <= he <= len(s.text)


@settings(max_examples=300, deadline=None)
@given(text)
def test_word_count_nonnegative_and_trim_invariant(t):
    n = count_words_in_text(t)
    assert n >= 0
    assert count_words_in_text("  " + t) >= 0


# ---- charset ladder (r5s5) --------------------------------------------------

from readur_spark.ml.charset import (
    decode_windows1252,
    detect_and_decode,
    normalize_label,
)


@given(st.binary(min_size=0, max_size=4096))
@settings(max_examples=200, deadline=None)
def test_charset_ladder_total_on_arbitrary_bytes(data):
    """detect_and_decode never raises and always returns a str plus a
    valid (encoding, source) pair — the fallback rung is total."""
    text, enc, src = detect_and_decode(data)
    assert isinstance(text, str)
    assert enc in {"utf-8", "windows-1252", "utf-16-le", "utf-16-be"}
    assert src in {"bom", "meta", "utf8-valid", "fallback"}


@given(st.binary(min_size=1, max_size=2048))
@settings(max_examples=200, deadline=None)
def test_whatwg_1252_decode_roundtrips(data):
    """WHATWG windows-1252 is injective byte->char: applying the
    inverse map to the decoded string recovers the exact bytes."""
    from readur_spark.ml.charset import _W1252_MAP

    text = decode_windows1252(data)
    inv = {v: k for k, v in _W1252_MAP.items()}
    raw = bytes(inv.get(c, ord(c)) for c in text)
    assert raw == data


@given(st.text(min_size=0, max_size=64))
@settings(max_examples=100, deadline=None)
def test_label_normalization_never_raises(label):
    assert normalize_label(label) in {
        None, "utf-8", "windows-1252", "utf-16-le", "utf-16-be"
    }
