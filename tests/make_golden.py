#!/usr/bin/env python
"""Regenerate the frozen extraction golden (tests/goldens/).

Run ONLY after an intentional, reviewed semantic change to the
extraction kernels; the frozen file exists to catch unintentional
drift (tests/test_frozen_golden.py).

    PYTHONPATH=. python tests/make_golden.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from readur_spark.datagen import generate_pages
from readur_spark.kernels.extract import extract_page

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_PATH = os.path.join(HERE, "goldens", "extracted_n500_s42.parquet")
HOSTILE_GOLDEN_PATH = os.path.join(HERE, "goldens", "extracted_hostile.parquet")
N_DOCS, SEED = 500, 42


def hostile_html_pages() -> list[tuple[str, bytes]]:
    """Adversarial HTML families for the byte-identity contract
    (VERDICT r4 item 8): malformed encodings, script/style-heavy
    markup, deep table nesting, and CDATA/comment edges — all
    deterministic literals so the frozen golden is stable. Each url
    names its family; the kernel must neither crash nor drift."""
    deep_open = "<table><tr><td>" * 50
    deep_close = "</td></tr></table>" * 50
    long_line = ("Sentence number %d keeps going. " * 200) % tuple(range(200))
    pages: list[tuple[str, bytes]] = [
        # --- malformed / hostile encodings ---
        ("https://hostile.example/enc/invalid-utf8.html",
         b"<html><body><p>Broken \xc3\x28 byte pair and \xff\xfe tail"
         b" survive extraction.</p></body></html>"),
        ("https://hostile.example/enc/cp1252-quotes.html",
         b"<html><body><p>Smart \x93quotes\x94 and an em\x97dash from"
         b" cp1252.</p></body></html>"),
        ("https://hostile.example/enc/bom-prefixed.html",
         b"\xef\xbb\xbf<html><body><p>BOM-prefixed document body"
         b" text.</p></body></html>"),
        ("https://hostile.example/enc/null-bytes.html",
         b"<html><body><p>Null\x00bytes\x00inside the paragraph"
         b" text.</p></body></html>"),
        # --- script/style-heavy boilerplate ---
        ("https://hostile.example/script/heavy.html",
         ("<html><head><style>" + ".c{color:red}" * 500 + "</style>"
          "<script>var x = '<p>not content</p>';" + "x += 1;" * 500
          + "</script></head><body><p>The only real sentence in a sea"
          " of code.</p><script>document.write('<b>injected</b>')"
          "</script></body></html>").encode()),
        ("https://hostile.example/script/unclosed.html",
         b"<html><body><script>var y = 'runaway string"
         b" <p>swallowed?</p>'<p>Content after an unclosed script"
         b" tag.</p></body></html>"),
        # --- deeply nested tables ---
        ("https://hostile.example/nest/tables-50.html",
         ("<html><body>" + deep_open + "<p>Needle paragraph at depth"
          " fifty.</p>" + deep_close + "</body></html>").encode()),
        ("https://hostile.example/nest/mismatched.html",
         b"<html><body><div><p>Opened div and paragraph"
         b" <b>bold <i>italic</b> crossed</i> never closed"
         b"</body></html>"),
        # --- CDATA / comment edges ---
        ("https://hostile.example/comment/fake-content.html",
         b"<html><body><!-- <p>commented-out fake content</p> -->"
         b"<p>Visible sentence between comment blocks.</p>"
         b"<!-- trailing --></body></html>"),
        ("https://hostile.example/comment/unclosed.html",
         b"<html><body><p>Before the comment.</p><!-- this comment"
         b" never closes <p>maybe swallowed</p></body></html>"),
        ("https://hostile.example/comment/cdata.html",
         b"<html><body><p>Real sentence before the CDATA block.</p>"
         b"<![CDATA[ raw <p>not markup</p> text ]]>"
         b"<p>Real sentence after the CDATA block.</p></body></html>"),
        ("https://hostile.example/comment/conditional.html",
         b"<html><body><!--[if IE]><p>old-browser branch</p><![endif]-->"
         b"<p>Unconditional body sentence.</p></body></html>"),
        # --- entity and attribute noise ---
        ("https://hostile.example/entity/mixed.html",
         b"<html><body><p>Fish &amp; chips cost &#163;5 &nbsp;"
         b" &lt;today&gt; &unknown; entity.</p></body></html>"),
        ("https://hostile.example/attr/markup-in-attr.html",
         b"<html><body><p title=\"<b>not bold</b>\" data-x='<i>no</i>'>"
         b"Attribute payloads must not leak.</p></body></html>"),
        # --- pathological shapes ---
        ("https://hostile.example/shape/one-long-line.html",
         ("<html><body><p>" + long_line + "</p></body></html>").encode()),
        ("https://hostile.example/shape/empty-body.html",
         b"<html><head><title>Only a title</title></head><body>"
         b"   \n\t  </body></html>"),
        ("https://hostile.example/shape/uppercase-tags.html",
         b"<HTML><BODY><P>UPPERCASE tags still parse.</P>"
         b"<SCRIPT>var z=1;</SCRIPT></BODY></HTML>"),
        ("https://hostile.example/shape/no-html-root.html",
         b"<p>Tag soup with no root element at all.</p>"
         b"<div>Second fragment.</div>"),
        # --- foreign / embedded content (r5 session 2) ---
        ("https://hostile.example/foreign/svg-math.html",
         b"<html><body><p>Prose before foreign content.</p>"
         b"<svg><title>svg title text</title><rect/></svg>"
         b"<math><mi>x</mi><mo>+</mo><mi>y</mi></math>"
         b"<p>Prose after foreign content.</p></body></html>"),
        ("https://hostile.example/foreign/template-noscript.html",
         b"<html><body><template><p>template fragment, render-inert"
         b"</p></template><noscript><p>noscript fallback branch</p>"
         b"</noscript><p>Always-rendered sentence.</p></body></html>"),
        ("https://hostile.example/foreign/iframe-object.html",
         b"<html><body><iframe src=\"x.html\"><p>iframe fallback"
         b" body</p></iframe><object data=\"y.pdf\"><p>object"
         b" fallback body</p></object><p>Host page sentence.</p>"
         b"</body></html>"),
        # --- whitespace / invisible characters (r5 session 2) ---
        ("https://hostile.example/ws/pre-block.html",
         b"<html><body><pre>  indented   code\n\tkeeps   internal"
         b"\n      spacing</pre><p>Prose after the pre block.</p>"
         b"</body></html>"),
        ("https://hostile.example/ws/zero-width.html",
         "<html><body><p>Zero​width‌joiners‍ and a"
         " ﻿BOM mid-text plus an  nbsp.</p></body>"
         "</html>".encode("utf-8")),
        ("https://hostile.example/ws/crlf-mixed.html",
         b"<html><body><p>Carriage\r\nreturn lines\rmixed\nwith"
         b" bare newlines.</p></body></html>"),
        # --- numeric entity edges (r5 session 9) ---
        ("https://hostile.example/entity/astral-surrogate.html",
         b"<html><body><p>Astral &#x1F600; emoji, an invalid"
         b" surrogate &#xD800; reference, and &#0; the nul"
         b" entity.</p></body></html>"),
        # --- attribute syntax soup (r5 session 9) ---
        ("https://hostile.example/attr/unquoted-duplicate.html",
         b"<html><body><p class=lead class=dup title=plain>Unquoted"
         b" and duplicated attributes.</p><img src=x.jpg alt=fallback>"
         b"<p data-broken=\"unterminated>Trailing sentence after a"
         b" runaway attribute value.</p></body></html>"),
        ("https://hostile.example/attr/data-uri-flood.html",
         ("<html><body><img src=\"data:image/png;base64,"
          + "QUJDRA==" * 400 + "\" alt=\"tiny\"><p>Sentence after a"
          " megabyte-shaped attribute payload.</p></body>"
          "</html>").encode()),
        # --- void / self-closing oddities (r5 session 9) ---
        ("https://hostile.example/shape/void-selfclose.html",
         b"<html><body>First fragment<br/>second line<hr>"
         b"<p/>Self-closed paragraph marker then text."
         b"<wbr>End.</body></html>"),
        # --- prolog / processing instructions (r5 session 9) ---
        ("https://hostile.example/prolog/xml-pi.html",
         b"<?xml version=\"1.0\" encoding=\"utf-8\"?>"
         b"<!DOCTYPE html PUBLIC \"-//W3C//DTD XHTML 1.0//EN\">"
         b"<?php echo 'server side'; ?>"
         b"<html><body><p>Body after prolog noise.</p></body></html>"),
        # --- deep list nesting (r5 session 9) ---
        ("https://hostile.example/nest/lists-40.html",
         ("<html><body>" + "<ul><li>" * 40 + "Needle item at depth"
          " forty." + "</li></ul>" * 40 + "</body></html>").encode()),
        # --- bidi control characters (r5 session 9) ---
        ("https://hostile.example/ws/bidi-controls.html",
         "<html><body><p>Visual ‮REVERSED‬ span and"
         " ‏ rtl mark ‎ ltr mark kept.</p></body>"
         "</html>".encode("utf-8")),
        # --- form controls (r5 session 9) ---
        ("https://hostile.example/shape/form-select.html",
         b"<html><body><form><select><option>alpha</option>"
         b"<option selected>beta</option></select>"
         b"<input type=\"text\" value=\"typed value\">"
         b"<textarea>area text body</textarea></form>"
         b"<p>Prose after the form.</p></body></html>"),
    ]
    return pages


def compute_hostile_golden() -> pa.Table:
    cols: dict[str, list] = {
        "url": [], "extracted_text": [], "confidence": [],
        "word_count": [], "status": [], "failure_reason": [],
    }
    for url, payload in hostile_html_pages():
        res = extract_page(url, payload)
        cols["url"].append(url)
        cols["extracted_text"].append(res.extracted_text)
        cols["confidence"].append(res.confidence)
        cols["word_count"].append(res.word_count)
        cols["status"].append(res.status)
        cols["failure_reason"].append(res.failure_reason)
    return pa.table(
        {
            "url": pa.array(cols["url"]),
            "extracted_text": pa.array(cols["extracted_text"]),
            "confidence": pa.array(cols["confidence"], pa.float32()),
            "word_count": pa.array(cols["word_count"], pa.int32()),
            "status": pa.array(cols["status"]),
            "failure_reason": pa.array(cols["failure_reason"]),
        }
    )


def compute_golden() -> pa.Table:
    rows = generate_pages(N_DOCS, seed=SEED).to_pylist()
    cols: dict[str, list] = {
        "url": [], "extracted_text": [], "confidence": [],
        "word_count": [], "status": [], "failure_reason": [],
    }
    for r in rows:
        payload = bytes(r["html"]) if r["html"] is not None else b""
        res = extract_page(r["url"], payload)
        cols["url"].append(r["url"])
        cols["extracted_text"].append(res.extracted_text)
        cols["confidence"].append(res.confidence)
        cols["word_count"].append(res.word_count)
        cols["status"].append(res.status)
        cols["failure_reason"].append(res.failure_reason)
    return pa.table(
        {
            "url": pa.array(cols["url"]),
            "extracted_text": pa.array(cols["extracted_text"]),
            "confidence": pa.array(cols["confidence"], pa.float32()),
            "word_count": pa.array(cols["word_count"], pa.int32()),
            "status": pa.array(cols["status"]),
            "failure_reason": pa.array(cols["failure_reason"]),
        }
    )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    pq.write_table(compute_golden(), GOLDEN_PATH, compression="zstd")
    print(GOLDEN_PATH)
    pq.write_table(
        compute_hostile_golden(), HOSTILE_GOLDEN_PATH, compression="zstd"
    )
    print(HOSTILE_GOLDEN_PATH)
