"""Deterministic synthetic Common-Crawl-style page corpus.

Implements FIXTURES.md §1: `pages(url, warc_ts, html, text, lang)` with
the payload-kind mix that exercises every extraction branch, a
Zipf-skewed host distribution (heavy hosts exercise salting), exact
duplicates (dedup), threshold-straddling sizes (priority buckets), and
one >10 MB text row at sf≥0.01 (truncation suffix). Seeded (default
42); no wall-clock, no external data.

The generator is pure Python/NumPy and writes parquet via pyarrow; the
bench pre-generates once per scale and caches under .cache/.
"""

from __future__ import annotations

import datetime as dt
import random
import zlib

import numpy as np

from readur_spark.kernels.image import encode_png_gray, encode_png_rgb

_VOCAB = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs spark engine extracts web pages at scale shuffle join "
    "partition salt skew broadcast column vector arrow batch stream "
    "document content analysis confidential agreement party disclosure "
    "information term section clause hereby witness whereof executed"
).split()

_LANGS = ["eng", "spa", "deu", "fra"]

_SPECIAL_SENTENCE = "café naïve résumé — 'quotes' • bullets"

_ACME_LINES = [
    "ACME Corporation Non-Disclosure Agreement",
    "This Agreement is entered into by and between ACME Corporation",
    "and the undersigned Recipient as of the Effective Date.",
    "The Recipient agrees to hold all Confidential Information in strict confidence.",
    "Confidential Information includes technical, business, and financial data.",
    _SPECIAL_SENTENCE,
]

KINDS = [
    # (kind, weight) — FIXTURES.md §1 mix
    ("text", 40),
    ("pdf_text", 20),
    ("pdf_junk_prefix", 2),
    ("pdf_image_based", 5),
    ("pdf_corrupted", 2),
    ("png", 10),
    ("html", 15),
    ("zip", 2),
    ("empty", 2),
    ("jpeg_header", 2),
]


def _sentence(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n_words))


def _paragraphs(rng: random.Random, n_words_total: int) -> str:
    out, n = [], 0
    while n < n_words_total:
        k = rng.randint(6, 14)
        out.append(_sentence(rng, k))
        n += k
    return ". ".join(out) + "."


# --- PDF builders ----------------------------------------------------------


def build_pdf(lines: list[str], compress: bool = False) -> bytes:
    """Minimal single-page text-layer PDF (reportlab-shaped, like the
    reference's create_test_pdfs.py fixtures)."""

    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    content_parts = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i > 0:
            content_parts.append("0 -14 Td")
        content_parts.append("(%s) Tj" % esc(line))
    content_parts.append("ET")
    content = "\n".join(content_parts).encode("latin-1", errors="replace")

    if compress:
        body = zlib.compress(content, 6)
        stream_dict = b"<< /Length %d /Filter /FlateDecode >>" % len(body)
    else:
        body = content
        stream_dict = b"<< /Length %d >>" % len(body)

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_dict + b"\nstream\n" + body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, obj in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)


def build_image_based_pdf(rng: random.Random, n_bytes: int) -> bytes:
    """Valid header, no text layer, mostly non-ASCII payload → fails
    the density gate, byte-scrape finds at most marker tokens."""
    head = b"%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
    junk = bytes(rng.randrange(128, 256) for _ in range(max(0, n_bytes - len(head))))
    return head + junk + b"\n%%EOF\n"


def build_corrupted_pdf(rng: random.Random) -> bytes:
    words = [_sentence(rng, 1) for _ in range(rng.randint(4, 10))]
    junk = bytes(rng.randrange(0, 32) for _ in range(64))
    middle = junk.join(w.encode() for w in words)
    return b"%PDF-1.4\n" + middle + bytes(rng.randrange(128, 256) for _ in range(128))


# --- HTML builder ----------------------------------------------------------

_HTML_TMPL = """<!DOCTYPE html>
<html><head><title>{title}</title><meta charset="utf-8"></head>
<body>
<header><div class="menu"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div></header>
<nav><ul><li><a href="/a">Politics</a></li><li><a href="/b">Sports</a></li><li><a href="/c">Tech</a></li></ul></nav>
<div class="ad-banner"><a href="http://ads.example/click">Buy one get one free! Limited offer click now</a></div>
<div class="content">
<article>
<h1>{title}</h1>
{paras}
</article>
</div>
<aside class="related"><a href="/x">Related story one</a> <a href="/y">Related story two</a></aside>
<footer><div>Copyright 2024 Example Media. All rights reserved. <a href="/privacy">Privacy</a> <a href="/terms">Terms</a></div></footer>
</body></html>"""

_HTML_BARE_TMPL = """<html><body>
<div id="nav"><a href="/">home</a><a href="/archive">archive</a></div>
<div id="main">{paras}</div>
<div class="footer">contact us at example dot com</div>
</body></html>"""


def build_html(rng: random.Random, n_words: int) -> tuple[bytes, str]:
    """Returns (html_bytes, expected main-content relevant text is NOT
    precomputed here — golden comes from the kernel)."""
    title = _sentence(rng, rng.randint(3, 6))
    n_paras = max(1, n_words // 40)
    paras = []
    for _ in range(n_paras):
        paras.append("<p>%s</p>" % _paragraphs(rng, rng.randint(25, 60)))
    if rng.random() < 0.3:
        html = _HTML_BARE_TMPL.format(paras="\n".join(paras))
    else:
        html = _HTML_TMPL.format(title=title, paras="\n".join(paras))
    return html.encode("utf-8"), title


# --- PNG builder -----------------------------------------------------------

_PNG_DIMS = [(50, 50), (100, 200), (300, 200), (150, 150), (1920, 1080)]


def build_png(rng: random.Random, dims_idx: int) -> bytes:
    w, h = _PNG_DIMS[dims_idx % len(_PNG_DIMS)]
    # deterministic gradient + noise pattern (no text rendering libs)
    seed = rng.randrange(0, 2**31)
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((xx * 255 / max(w - 1, 1)) * 0.5 + (yy * 255 / max(h - 1, 1)) * 0.3).astype(
        np.float64
    )
    img += rs.randint(0, 40, size=(h, w))
    gray = np.clip(img, 0, 255).astype(np.uint8)
    if seed % 2 == 0:
        # half the pages are truecolor (decided off the already-drawn
        # seed — no extra RNG consumption) so the corpus exercises the
        # color decode → color thumbnail path end-to-end
        rgb = np.stack([gray, gray[::-1, :], 255 - gray], axis=-1)
        return encode_png_rgb(rgb)
    return encode_png_gray(gray)


# --- corpus ---------------------------------------------------------------


def _zipf_host(rng: random.Random, n_hosts: int = 200) -> str:
    """Zipf-ish skew: host0 ≫ host1 ≫ …; a few heavy hosts dominate."""
    r = rng.random()
    # inverse-CDF of 1/k over n_hosts buckets
    h = int(n_hosts ** r) - 1
    return "host%d.example" % max(0, min(n_hosts - 1, h))


def generate_pages(
    n_docs: int, seed: int = 42, include_huge_text: bool | None = None
) -> "pyarrow.Table":  # noqa: F821
    import pyarrow as pa

    rng = random.Random(seed)
    if include_huge_text is None:
        include_huge_text = n_docs >= 5000

    kinds, weights = zip(*KINDS)
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

    urls: list[str] = []
    tss: list[dt.datetime] = []
    htmls: list[bytes | None] = []
    texts: list[str | None] = []
    langs: list[str] = []

    dup_pool: list[tuple[bytes, str | None]] = []

    for i in range(n_docs):
        kind = rng.choices(kinds, weights=weights, k=1)[0]
        host = _zipf_host(rng)
        lang = rng.choice(_LANGS)
        ts = base_ts + dt.timedelta(seconds=(i * 2591999) % (30 * 86400))

        # ~5% exact duplicates of an earlier payload under a new url
        if dup_pool and rng.random() < 0.05:
            payload, text_col = dup_pool[rng.randrange(len(dup_pool))]
            ext = "bin"
            urls.append("https://%s/dup/%d.%s" % (host, i, ext))
            tss.append(ts)
            htmls.append(payload)
            texts.append(text_col)
            langs.append(lang)
            continue

        text_col: str | None = None
        if kind == "text":
            body = _paragraphs(rng, rng.randint(30, 400))
            if rng.random() < 0.1:
                body = "  " + body + " \n"  # exercises trim
            payload = body.encode("utf-8")
            text_col = body
            ext = "txt"
        elif kind == "pdf_text":
            lines = list(_ACME_LINES[: rng.randint(3, len(_ACME_LINES))])
            lines += [_sentence(rng, rng.randint(5, 10)) for _ in range(rng.randint(2, 8))]
            payload = build_pdf(lines, compress=rng.random() < 0.5)
            ext = "pdf"
        elif kind == "pdf_junk_prefix":
            lines = [_sentence(rng, rng.randint(5, 10)) for _ in range(4)]
            payload = bytes([0] * rng.randint(4, 64)) + build_pdf(lines)
            ext = "pdf"
        elif kind == "pdf_image_based":
            payload = build_image_based_pdf(rng, rng.randint(2000, 20000))
            ext = "pdf"
        elif kind == "pdf_corrupted":
            payload = build_corrupted_pdf(rng)
            ext = "pdf"
        elif kind == "png":
            payload = build_png(rng, rng.randrange(len(_PNG_DIMS)))
            ext = "png"
        elif kind == "html":
            payload, _title = build_html(rng, rng.randint(80, 600))
            ext = "html"
        elif kind == "zip":
            payload = b"PK\x03\x04" + bytes(rng.randrange(0, 256) for _ in range(256))
            ext = "zip"
        elif kind == "empty":
            payload = b""
            ext = "txt"
        elif kind == "jpeg_header":
            payload = (
                b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
                b"\xff\xc0\x00\x11\x08\x00\xc8\x00\x96\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
                + bytes(rng.randrange(0, 256) for _ in range(512))
                + b"\xff\xd9"
            )
            ext = "jpg"
        else:  # pragma: no cover
            raise AssertionError(kind)

        urls.append("https://%s/%s/%d.%s" % (host, kind, i, ext))
        tss.append(ts)
        htmls.append(payload)
        texts.append(text_col)
        langs.append(lang)
        if len(payload) and len(dup_pool) < 64 and rng.random() < 0.2:
            dup_pool.append((payload, text_col))

    # threshold-straddling sizes (priority buckets A9) + huge-text row
    extra = []
    mb = 1024 * 1024
    for size, tag in [(mb, "1mb"), (mb + 1, "1mb_plus"), (5 * mb, "5mb")]:
        if n_docs >= 500:
            body = ("word " * (size // 5))[:size]
            extra.append(("https://host0.example/big/%s.txt" % tag, body))
    if include_huge_text:
        size = 10 * mb + 4096  # crosses MAX_TEXT_CONTENT_SIZE → truncation
        body = ("lorem ipsum dolor sit amet " * (size // 27 + 1))[:size]
        extra.append(("https://host0.example/big/huge.txt", body))
    for url, body in extra:
        urls.append(url)
        tss.append(base_ts + dt.timedelta(days=15))
        htmls.append(body.encode("utf-8"))
        texts.append(body)
        langs.append("eng")

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def generate_scaling_pages(n_docs: int, seed: int = 43) -> "pyarrow.Table":  # noqa: F821
    """Throughput-measurement corpus: realistic Common-Crawl page sizes
    (median real-web HTML is tens of KB with deep boilerplate), where
    extraction is CPU-bound (~5 MB/s/core measured) rather than
    transfer-bound. The tiny-page mixed corpus (generate_pages) stays
    the correctness corpus; this one exists so scaling-efficiency
    numbers measure compute scaling, not one box's disk bandwidth."""
    import pyarrow as pa

    rng = random.Random(seed)
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_docs):
        host = _zipf_host(rng)
        r = rng.random()
        if r < 0.8:
            payload, _ = build_html(rng, rng.randint(1000, 6000))
            ext = "html"
            text_col = None
        elif r < 0.9:
            body = _paragraphs(rng, rng.randint(500, 3000))
            payload, text_col, ext = body.encode("utf-8"), body, "txt"
        else:
            lines = [_sentence(rng, rng.randint(6, 12)) for _ in range(rng.randint(40, 120))]
            payload = build_pdf(lines, compress=rng.random() < 0.5)
            ext, text_col = "pdf", None
        urls.append("https://%s/p/%d.%s" % (host, i, ext))
        tss.append(base_ts + dt.timedelta(seconds=i))
        htmls.append(payload)
        texts.append(text_col)
        langs.append(rng.choice(_LANGS))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_pages_parquet(path: str, n_docs: int, seed: int = 42) -> str:
    import pyarrow.parquet as pq

    table = generate_pages(n_docs, seed=seed)
    pq.write_table(table, path)
    return path


def pages_for_sf(sf: float) -> int:
    """Scale-factor convention matching TESTDATA.md: sf0.001 ≈ 500 docs."""
    return max(50, int(round(500_000 * sf)))
