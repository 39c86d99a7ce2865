"""Reference-golden parity: the reference's OWN test inputs, verbatim.

Each case cites the file:line in /root/reference it mirrors; the
asserted outputs are what the reference's extractors produce on the
same bytes (per-row invariant: byte-identical extracted text).
"""

from __future__ import annotations

import pytest

from readur_spark.kernels import mime as mime_k
from readur_spark.kernels import text as text_k
from readur_spark.kernels.extract import extract_page
from readur_spark.kernels.textmeta import extract_text_metadata

# src/tests/ocr_tests.rs:68 — exact passthrough string
REF_PASSTHROUGH = "This is a test text file.\nWith multiple lines."

# create_test_pdfs.py simple text fixtures (verbatim)
REF_TEXT_FIXTURES = [
    ("acme_sample.txt",
     "ACME Non-Disclosure Agreement\nThis agreement is entered into between "
     "ACME and the recipient for the purpose of protecting confidential information."),
    ("multiline_text.txt",
     "Line one with several words\nLine two with more content\nLine three "
     "continues the pattern\nFinal line ends the document"),
    ("mixed_content.txt",
     "Document with numbers 123 and symbols @#$ mixed with normal text."),
    ("special_chars.txt",
     "Text with special characters: café naïve résumé — and 'quotes' • bullets"),
]


def test_exact_passthrough_reference_string():
    """ocr_tests.rs:64-79: assert_eq!(extracted_text, test_content)."""
    assert text_k.read_plain_text(REF_PASSTHROUGH.encode()) == REF_PASSTHROUGH


@pytest.mark.parametrize("name,content", REF_TEXT_FIXTURES)
def test_text_fixture_roundtrip(name, content):
    """The reference's simple text fixtures extract byte-identically
    through the full dispatch (A1 → A30), confidence 100."""
    r = extract_page("https://h.example/%s" % name, content.encode("utf-8"))
    assert r.status == "completed"
    assert r.extracted_text == content.strip()
    assert r.confidence == 100.0


def test_unsupported_mime_error_contract():
    """ocr_tests.rs:81-94: unsupported type → error mentioning the
    unsupported type (reference: 'Unsupported MIME type'; engine:
    'Unsupported file type: <mime>' per enhanced.rs:1481 wording)."""
    r = extract_page("https://h.example/archive.zip", b"PK\x03\x04junkjunk")
    assert r.status == "failed"
    assert "Unsupported" in (r.error or "")
    assert r.failure_reason == "unsupported_format"


class TestMimeDetectionTable:
    """src/mime_detection.rs:344-431 test table, verbatim cases."""

    def test_extension_pdf(self):
        mime, _conf, method = mime_k.detect_from_extension("test.pdf")
        assert mime == "application/pdf"
        assert method == "extension"

    def test_trusted_server_type(self):
        mime, _conf, method = mime_k.detect_mime(
            b"", "test.pdf", server_mime_type="application/pdf"
        )
        assert mime == "application/pdf"

    def test_untrusted_server_falls_back(self):
        # server says octet-stream → untrusted → extension wins
        mime, _conf, _m = mime_k.detect_mime(
            b"", "test.pdf", server_mime_type="application/octet-stream"
        )
        assert mime == "application/pdf"

    def test_compatibility_pairs(self):
        assert mime_k.are_mime_types_compatible("image/jpeg", "image/jpg")
        assert mime_k.are_mime_types_compatible("image/jpg", "image/jpeg")
        assert mime_k.are_mime_types_compatible("text/plain", "text/plain")
        assert not mime_k.are_mime_types_compatible("image/jpeg", "text/plain")

    def test_pdf_magic_bytes(self):
        mime, conf, method = mime_k.detect_mime(b"%PDF-1.4", "test.pdf")
        assert mime == "application/pdf"
        assert method == "magic_bytes"
        assert conf in ("high", "very_high")

    def test_jpeg_magic_bytes(self):
        mime, _conf, _m = mime_k.detect_mime(b"\xff\xd8\xff", "test.jpg")
        assert mime == "image/jpeg"


def test_html_format_sniff_reference_case():
    """metadata_extraction/tests.rs:274-290: HTML content under
    text/plain still sniffs text_format='html'."""
    html = b"<!DOCTYPE html>\n<html><body><p>x</p></body></html>"
    meta = extract_text_metadata(html)
    assert meta.get("text_format") == "html"


def test_special_chars_word_count_stability():
    """integration_pdf_word_count_tests.rs theme: unicode text counts
    by whitespace split, not bytes."""
    content = REF_TEXT_FIXTURES[3][1]
    assert text_k.count_words_in_text(content) == len(content.split())
