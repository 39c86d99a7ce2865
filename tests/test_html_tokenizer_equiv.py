"""Fast tokenizer ≡ stdlib html.parser path, byte-for-byte."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from readur_spark.datagen import build_html, generate_pages
from readur_spark.kernels.html_extract import extract_main_content


def _both(html: str) -> tuple[str, str]:
    return (
        extract_main_content(html, use_fast_tokenizer=False),
        extract_main_content(html, use_fast_tokenizer=True),
    )


def test_equivalence_on_synthetic_corpus():
    rng = random.Random(23)
    pages = [build_html(rng, rng.randint(100, 5000))[0].decode() for _ in range(200)]
    mixed = generate_pages(400, seed=42).to_pylist()
    pages += [
        r["html"].decode("utf-8", "replace")
        for r in mixed
        if r["url"].endswith(".html")
    ]
    for h in pages:
        a, b = _both(h)
        assert a == b


def test_equivalence_entities_and_rawtext():
    cases = [
        "<html><body><p>a &amp; b &lt;c&gt; &nbsp; d</p></body></html>",
        "<html><head><title>T &amp; t</title><script>var x = '<p>not text</p>';</script>"
        "<style>p { color: red }</style></head><body><p>real body text here</p></body></html>",
        "<!-- comment with <p>fake</p> --><p>visible words here indeed</p>",
        "<p>unclosed paragraph with plenty of words to pass the gate",
        "<P CLASS='Content'>upper case tags with words enough here</P>",
        "<div class=\"ad-banner\"><a href='#'>click</a></div><p>body words enough to keep</p>",
    ]
    for h in cases:
        a, b = _both(h)
        assert a == b, h


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>/ab &;pdiv\"'=clas!-\n", max_size=400))
def test_fast_tokenizer_total_on_soup(s):
    out = extract_main_content(s, use_fast_tokenizer=True)
    assert isinstance(out, str)
