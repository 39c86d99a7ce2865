"""Unit tests for the WHATWG charset-detection ladder — kernel edge
cases (BOM precedence, label table, prescan bound, total fallback),
construction round-trips, and the one-Arrow-stage plan pin."""

import pytest

from readur_spark.ml.charset import (
    _CLASSES,
    _FOOT,
    _encode_page,
    constructed_charset_pages,
    decode_windows1252,
    detect_and_decode,
    detect_decode_table,
    normalize_label,
    scan_meta_charset,
    sniff_bom,
)


class TestKernel:
    def test_every_class_round_trips(self):
        base = "Hello plain ascii body, 12345."
        for i, (hdr, sfx, codec, enc, src) in enumerate(_CLASSES):
            page = hdr + base + sfx + _FOOT
            text, e, s = detect_and_decode(_encode_page(page, codec))
            assert (text, e, s) == (page, enc, src), f"class {i}"

    def test_whatwg_1252_total_and_roundtrip(self):
        # WHATWG maps cp1252's five undefined bytes to C1 controls —
        # the decode is total over all 256 byte values and injective,
        # so fallback decoding never raises and never conflates bytes.
        raw = bytes(range(256))
        text = decode_windows1252(raw)
        assert len(text) == 256
        assert text[0x80] == "€"  # €
        assert text[0x81] == "\x81"    # undefined in cp1252 -> C1
        assert text[0x9D] == "\x9d"
        assert len(set(text)) == 256

    def test_bom_beats_meta(self):
        data = b"\xef\xbb\xbf<meta charset=\"iso-8859-1\">caf\xc3\xa9"
        text, enc, src = detect_and_decode(data)
        assert (enc, src) == ("utf-8", "bom")
        assert text.endswith("café")

    def test_utf16_boms(self):
        s = "<html>ok ✓</html>"
        t, e, src = detect_and_decode(b"\xff\xfe" + s.encode("utf-16-le"))
        assert (t, e, src) == (s, "utf-16-le", "bom")
        t, e, src = detect_and_decode(b"\xfe\xff" + s.encode("utf-16-be"))
        assert (t, e, src) == (s, "utf-16-be", "bom")

    def test_meta_utf16_label_decodes_as_utf8(self):
        # spec §4.2: bytes the prescan could read as ASCII cannot be
        # UTF-16 — a meta-declared utf-16 is decoded as utf-8.
        d = b'<meta charset="utf-16">ok \xc3\xa9'
        text, enc, src = detect_and_decode(d)
        assert (enc, src) == ("utf-8", "meta")
        assert text.endswith("é")

    def test_meta_utf8_with_invalid_bytes_replaces(self):
        d = b'<meta charset="utf-8">bad \xa9 byte'
        text, enc, src = detect_and_decode(d)
        assert (enc, src) == ("utf-8", "meta")
        assert "�" in text

    def test_prescan_window_is_1024_bytes(self):
        late = b"<html><body>" + b"x" * 1100 + b'<meta charset="iso-8859-1">'
        assert scan_meta_charset(late) is None
        early = b'<html><head><meta charset="ISO-8859-1"></head>' + b"x" * 1100
        assert scan_meta_charset(early) == "ISO-8859-1"

    def test_charset_in_body_text_is_not_a_declaration(self):
        # the prescan only reads inside <meta ...> tags; prose that
        # mentions charset=iso-8859-1 must not hijack the decode.
        d = b"<html><body>set charset=iso-8859-1 in your config \xc3\xa9"
        text, enc, src = detect_and_decode(d)
        assert (enc, src) == ("utf-8", "utf8-valid")

    def test_label_table(self):
        assert normalize_label(" Latin1 ") == "windows-1252"
        assert normalize_label("US-ASCII") == "windows-1252"
        assert normalize_label("UTF8") == "utf-8"
        assert normalize_label("utf-16") == "utf-16-le"
        assert normalize_label("bogus-encoding") is None

    def test_sniff_bom_none(self):
        assert sniff_bom(b"plain") == (None, 0)
        assert sniff_bom(b"") == (None, 0)

    def test_fallback_on_bare_cp1252(self):
        d = b"quote \x93smart\x94 \xa9 2020"
        text, enc, src = detect_and_decode(d)
        assert (enc, src) == ("windows-1252", "fallback")
        assert text == "quote “smart” © 2020"


class TestSparkOperator:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_constructed_pages_detect_back(self, spark):
        docs = self._docs(
            spark, [(i, f"doc body {i} with <tags> and ünïcode") for i in range(10)]
        )
        pages = constructed_charset_pages(docs)
        out = {
            r["doc_id"]: (r["encoding"], r["source"])
            for r in detect_decode_table(pages).collect()
        }
        for i in range(10):
            _, _, _, enc, src = _CLASSES[i % 5]
            assert out[i] == (enc, src), f"doc {i}"

    def test_decoded_text_strips_markup_chars_from_base(self, spark):
        # construction projects the body to ASCII-without-angle-brackets,
        # so body text can never fake a meta declaration.
        docs = self._docs(spark, [(3, "a <meta charset=utf-16> trap é")])
        row = detect_decode_table(constructed_charset_pages(docs)).collect()[0]
        assert row["source"] == "utf8-valid"
        assert "<meta charset" not in row["text"].split("<body>")[1]

    def test_single_arrow_stage_no_shuffle(self, spark):
        docs = self._docs(spark, [(1, "x")])
        plan = (
            detect_decode_table(constructed_charset_pages(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # pure projection, fuses with scan
