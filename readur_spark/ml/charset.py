"""Charset detection + decode — the WHATWG Encoding-standard ladder.

The reference engine reads text payloads as strict UTF-8
(src/ocr/enhanced.rs:1094 `std::fs::read_to_string`, which errors on
any non-UTF-8 byte) and renders subprocess output lossily
(`String::from_utf8_lossy`). That contract is fine for its own uploads
but wrong for Common-Crawl-style pages, where a long tail of documents
is windows-1252 / UTF-16 / mislabeled Latin-1: a strict-UTF-8 reader
drops or mangles them wholesale. This module implements the published
browser algorithm instead (WHATWG Encoding standard + the HTML5
`meta` prescan, https://encoding.spec.whatwg.org/):

  1. BOM sniff (UTF-8 / UTF-16LE / UTF-16BE) — the BOM always wins;
  2. `<meta charset=...>` / `<meta http-equiv=Content-Type ...>`
     prescan over the first 1024 bytes, labels normalized through the
     WHATWG label table (latin-1/ascii/iso-8859-1 are all labels OF
     windows-1252; a meta-declared utf-16 is decoded as utf-8, spec
     §4.2 "get an output encoding");
  3. strict UTF-8 validation of the undeclared remainder;
  4. windows-1252 fallback — WHATWG's mapping, NOT Python's cp1252:
     the five bytes cp1252 leaves undefined (81 8D 8F 90 9D) map to
     the corresponding C1 controls, so the fallback can never fail and
     decode(encode(s)) round-trips for every byte string.

Scale design: detection reads a bounded 1024-byte head (prescan) or a
single strict-validation pass; the whole ladder runs inside one
Arrow-batched mapInPandas projection — no shuffle, fuses with the
scan, and the common case (valid UTF-8, the overwhelming majority of
the modern web) costs one C-level validate.

The registered query runs the ladder over a CONSTRUCTED mixed-charset
corpus: each document is rendered into page BYTES under a
doc_id-derived rule (meta-declared utf-8, meta-declared iso-8859-1
encoded as cp1252, BOM'd UTF-16LE, bare valid UTF-8, bare cp1252) —
so the DuckDB oracle knows the ground-truth decoded text, the winning
encoding, and which ladder rung fired, and value-hashes all three.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# ---- pure kernel ------------------------------------------------------------

# WHATWG windows-1252 index (https://encoding.spec.whatwg.org/windows-1252.html):
# 0x80-0x9F row. Python's cp1252 codec raises on 81 8D 8F 90 9D; WHATWG
# maps them to the same-numbered C1 controls, making the decode total.
_W1252_HIGH = (
    "€‚ƒ„…†‡"
    "ˆ‰Š‹ŒŽ"
    "‘’“”•–—"
    "˜™š›œžŸ"
)
_W1252_MAP = {0x80 + i: ch for i, ch in enumerate(_W1252_HIGH)}


def decode_windows1252(data: bytes) -> str:
    """Total windows-1252 decode per the WHATWG index (never raises)."""
    return data.decode("latin-1").translate(_W1252_MAP)


# label -> canonical encoding, per the WHATWG label table (subset
# covering the labels that actually occur on the web; unknown -> None).
_LABELS: dict[str, str] = {}
for _lab in ("utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8",
             "unicode20utf8", "x-unicode20utf8"):
    _LABELS[_lab] = "utf-8"
for _lab in ("windows-1252", "cp1252", "x-cp1252", "ansi_x3.4-1968",
             "ascii", "us-ascii", "iso-8859-1", "iso8859-1", "iso88591",
             "iso_8859-1", "latin1", "l1", "csisolatin1", "cp819",
             "ibm819", "iso-ir-100"):
    _LABELS[_lab] = "windows-1252"
for _lab in ("utf-16", "utf-16le", "unicode", "csunicode", "ucs-2",
             "iso-10646-ucs-2"):
    _LABELS[_lab] = "utf-16-le"
_LABELS["utf-16be"] = "utf-16-be"


def normalize_label(label: str) -> Optional[str]:
    return _LABELS.get(label.strip().lower())


def sniff_bom(data: bytes) -> tuple[Optional[str], int]:
    """(canonical encoding, BOM length) — UTF-16 checked first; the
    byte patterns are disjoint from UTF-8's EF BB BF."""
    if data[:2] == b"\xff\xfe":
        return "utf-16-le", 2
    if data[:2] == b"\xfe\xff":
        return "utf-16-be", 2
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8", 3
    return None, 0


_PRESCAN_BYTES = 1024

import re as _re

_META_TAG_RE = _re.compile(r"<meta[^>]*>", _re.I)
_CHARSET_RE = _re.compile(r"charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-.:]+)", _re.I)


def scan_meta_charset(data: bytes) -> Optional[str]:
    """HTML5-prescan-lite: look for a charset declaration inside <meta>
    tags within the first 1024 bytes (the spec's prescan window). Both
    declaration forms share the `charset=` substring, so one inner
    regex covers `<meta charset=...>` and
    `<meta http-equiv=Content-Type content="...; charset=...">`.
    Returns the RAW label (normalize separately) or None."""
    head = data[:_PRESCAN_BYTES].decode("latin-1")
    for tag in _META_TAG_RE.finditer(head):
        m = _CHARSET_RE.search(tag.group(0))
        if m:
            return m.group(1)
    return None


def detect_and_decode(data: bytes) -> tuple[str, str, str]:
    """Run the WHATWG ladder on one page. Returns
    (text, encoding, source) with source in
    {'bom', 'meta', 'utf8-valid', 'fallback'}."""
    enc, n = sniff_bom(data)
    if enc is not None:
        body = data[n:]
        if enc == "utf-8":
            try:
                return body.decode("utf-8"), enc, "bom"
            except UnicodeDecodeError:
                return body.decode("utf-8", errors="replace"), enc, "bom"
        codec = "utf-16-le" if enc == "utf-16-le" else "utf-16-be"
        return body.decode(codec, errors="replace"), enc, "bom"

    raw = scan_meta_charset(data)
    canon = normalize_label(raw) if raw else None
    if canon is not None:
        # spec §4.2: a meta-declared utf-16 (impossible if the prescan
        # could read it as ASCII) is decoded as utf-8.
        if canon.startswith("utf-16"):
            canon = "utf-8"
        if canon == "utf-8":
            try:
                return data.decode("utf-8"), "utf-8", "meta"
            except UnicodeDecodeError:
                return data.decode("utf-8", errors="replace"), "utf-8", "meta"
        return decode_windows1252(data), "windows-1252", "meta"

    try:
        return data.decode("utf-8"), "utf-8", "utf8-valid"
    except UnicodeDecodeError:
        pass
    return decode_windows1252(data), "windows-1252", "fallback"


# ---- Spark operator ---------------------------------------------------------


def detect_decode_table(
    df: DataFrame, *, id_col: str = "doc_id", data_col: str = "page"
) -> DataFrame:
    """(id, encoding, source, text) via one Arrow-batched projection.
    No shuffle; the per-batch loop is over variable-length binary
    payloads (inherently per-document work, same stance as
    operators/extract.py's vectorization note)."""
    schema = f"{id_col} long, encoding string, source string, text string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = [detect_and_decode(d) for d in b[data_col]]
            yield pd.DataFrame(
                {
                    id_col: b[id_col].values,
                    "encoding": [o[1] for o in out],
                    "source": [o[2] for o in out],
                    "text": [o[0] for o in out],
                }
            )

    return df.select(id_col, data_col).mapInPandas(run, schema=schema)


def _normalize_bytes(b: bytes) -> bytes:
    """Ladder-decode then re-encode as clean UTF-8. Binary payloads
    (PDF/image/zip magics) pass through untouched; already-valid
    BOM-less UTF-8 returns the SAME object (zero-copy fast path)."""
    from readur_spark.kernels.mime import _sniff_magic

    if not b or _sniff_magic(b) is not None:
        return b
    if sniff_bom(b)[0] is None and scan_meta_charset(b) is None:
        try:
            b.decode("utf-8")
            return b  # the overwhelming majority at crawl scale
        except UnicodeDecodeError:
            pass
    text, _enc, _src = detect_and_decode(b)
    return text.encode("utf-8")


@F.pandas_udf(BinaryType())
def _normalize_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # the fast path (strict C-level UTF-8 validate, no allocation) runs
    # per row INSIDE the Arrow batch; only declared/invalid pages pay
    # for the full ladder — same gating stance as ml/mojibake.py (a
    # JVM CASE WHEN cannot conditionally skip a Python UDF).
    for s in batches:
        yield s.map(_normalize_bytes)


def normalize_page_encoding(
    pages: DataFrame, *, data_col: str = "html"
) -> DataFrame:
    """Rewrite text-ish payloads as clean UTF-8 via the WHATWG ladder
    so every downstream decode (kernels/extract.py's utf-8 read, the
    FTS tokenizer, language ID) sees one canonical encoding. Pure
    projection, schema unchanged."""
    return pages.withColumn(data_col, _normalize_udf(F.col(data_col)))


# ---- constructed mixed-charset corpus (SQL-twinnable ground truth) ----------

# body base: ASCII-projected, angle-bracket-free (so body text can
# never fake a <meta> tag inside the prescan window), capped at 160
# chars so header+body sit inside the 1024-byte prescan.
_BASE_RE = "[<>]|[^ -~]"
_BASE_LEN = 160

_H_UTF8 = '<html><head><meta charset="utf-8"></head><body>'
_H_1252 = (
    '<html><head><meta http-equiv="Content-Type" '
    'content="text/html; charset=iso-8859-1"></head><body>'
)
_H_BARE = "<html><head></head><body>"
_FOOT = "</body></html>"

# per class (doc_id % 5): header, non-ASCII suffix, python codec for
# the page bytes, expected (encoding, source) from the ladder.
# suffixes are chosen so each rung is genuinely exercised:
#   1: •’ -> cp1252 95 92 (invalid as UTF-8, meta must win)
#   3: é -> valid 2-byte UTF-8 (strict sniff, not ascii-trivial)
#   4: ©’ -> cp1252 A9 92 (bare continuation bytes: strict
#      UTF-8 fails, fallback rung fires)
_CLASSES = [
    (_H_UTF8, " — ü", "utf-8", "utf-8", "meta"),
    (_H_1252, " • ’", "cp1252", "windows-1252", "meta"),
    (_H_BARE, " ✓", "utf-16-le-bom", "utf-16-le", "bom"),
    (_H_BARE, " é", "utf-8", "utf-8", "utf8-valid"),
    (_H_BARE, " © ’", "cp1252", "windows-1252", "fallback"),
]


def _encode_page(s: str, codec: str) -> bytes:
    if codec == "utf-16-le-bom":
        return b"\xff\xfe" + s.encode("utf-16-le")
    return s.encode(codec)


@F.pandas_udf(BinaryType())
def _encode_udf(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # column layout: "cls|page_str" — cls selects the codec.
    for s in texts:
        yield s.map(
            lambda v: _encode_page(v[2:], _CLASSES[int(v[0])][2])
        )


def constructed_charset_pages(docs: DataFrame) -> DataFrame:
    """(doc_id, page binary) — each document rendered into page bytes
    under the doc_id%5 charset rule. The page STRING is built JVM-side
    (concat/CASE over the ASCII projection); only the final encode is
    Python, batched over Arrow."""
    cls = (F.col("doc_id") % 5).cast("int")
    base = F.substring(
        F.regexp_replace(F.col("text"), _BASE_RE, ""), 1, _BASE_LEN
    )
    header = F.element_at(
        F.array(*[F.lit(c[0]) for c in _CLASSES]), cls + 1
    )
    suffix = F.element_at(
        F.array(*[F.lit(c[1]) for c in _CLASSES]), cls + 1
    )
    page_str = F.concat(header, base, suffix, F.lit(_FOOT))
    tagged = F.concat(cls.cast("string"), F.lit("|"), page_str)
    return docs.select(
        "doc_id", _encode_udf(tagged).alias("page")
    )


def _sql_lit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _oracle() -> str:
    enc = " ".join(
        f"WHEN {i} THEN {_sql_lit(c[3])}" for i, c in enumerate(_CLASSES)
    )
    src = " ".join(
        f"WHEN {i} THEN {_sql_lit(c[4])}" for i, c in enumerate(_CLASSES)
    )
    hdr = " ".join(
        f"WHEN {i} THEN {_sql_lit(c[0])}" for i, c in enumerate(_CLASSES)
    )
    sfx = " ".join(
        f"WHEN {i} THEN {_sql_lit(c[1])}" for i, c in enumerate(_CLASSES)
    )
    return f"""
    WITH b AS (
      SELECT doc_id, CAST(doc_id % 5 AS INT) AS cls,
             substr(regexp_replace(text, '{_BASE_RE}', '', 'g'),
                    1, {_BASE_LEN}) AS base
      FROM documents
    )
    SELECT doc_id,
           CASE cls {enc} END AS encoding,
           CASE cls {src} END AS source,
           CASE cls {hdr} END || base || CASE cls {sfx} END
             || {_sql_lit(_FOOT)} AS text
    FROM b
    """


@register("charset_detect_decode", oracle=_oracle())
def charset_detect_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHATWG charset ladder over the constructed mixed-charset corpus:
    the oracle re-derives the page string, the winning encoding, and
    the ladder rung from the construction rule, so BOM sniff, meta
    prescan + label normalization, strict-UTF-8 validation, and the
    total windows-1252 fallback are all value-hashed byte-for-byte."""
    docs = load(spark, sf_dir, "documents")
    pages = constructed_charset_pages(docs)
    return detect_decode_table(pages)
