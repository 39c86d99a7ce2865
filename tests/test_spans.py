"""Main-content span offsets (kernels/html_extract.py:
extract_main_content_spans + queries/extraction.py: span_table).

The constructed-corpus value-hash runs in test_entry_contract.py;
here: span/source agreement on hand cases, and the structural
invariants over the hostile golden corpus — text reconstruction,
monotonic non-overlapping ranges, slice/normalization consistency."""

from __future__ import annotations

import re

from readur_spark.kernels.html_extract import (
    extract_main_content,
    extract_main_content_spans,
)

_WS = re.compile(r"\s+")


def _norm_strip_tags(s: str) -> str:
    import html as h

    return _WS.sub(" ", h.unescape(re.sub(r"<[^>]*>", " ", s))).strip()


class TestHandCases:
    def test_simple_blocks_slice_exactly(self):
        html = (
            "<html><body><nav>junk nav junk nav junk</nav>"
            "<p>The first real paragraph of content here.</p>"
            "<p>Another paragraph with plenty of words inside.</p>"
            "</body></html>"
        )
        spans = extract_main_content_spans(html)
        assert len(spans) == 2
        for s, e, t in spans:
            assert html[s:e] == t

    def test_multichunk_block_covers_source_extent(self):
        html = "<p>alpha &amp; beta <b>bold bit</b> tail words here.</p>"
        [(s, e, t)] = extract_main_content_spans(html)
        assert t == "alpha & beta bold bit tail words here."
        assert html[s:e] == "alpha &amp; beta <b>bold bit</b> tail words here."
        assert _norm_strip_tags(html[s:e]) == t

    def test_killed_subtree_has_no_span(self):
        html = (
            "<body><script>var x = 'not content at all';</script>"
            "<p>Real words that should be the only block kept.</p></body>"
        )
        spans = extract_main_content_spans(html)
        assert len(spans) == 1
        assert "var x" not in spans[0][2]

    def test_join_equals_extract(self):
        html = (
            "<article><h1>A Heading With Several Words</h1>"
            "<p>Body text one with enough words.</p>"
            "<p>Body text two with enough words.</p></article>"
        )
        spans = extract_main_content_spans(html)
        assert "\n".join(t for _, _, t in spans) == extract_main_content(html)


class TestGoldenCorpusInvariants:
    def _pages(self):
        from readur_spark import datagen

        return datagen.generate_pages(300, seed=7).to_pylist()

    def test_reconstruction_and_monotonic_spans(self):
        checked = 0
        for r in self._pages():
            blob = bytes(r["html"]) if r["html"] else b""
            if not blob or not r["url"].endswith((".html", "/")):
                continue
            html = blob.decode("utf-8", "replace")
            spans = extract_main_content_spans(html)
            # 1. text reconstruction: span texts ARE the extraction
            assert "\n".join(t for _, _, t in spans) == extract_main_content(
                html
            ), r["url"]
            # 2. ranges are valid, ordered, non-overlapping
            prev_end = -1
            for s, e, t in spans:
                if s < 0:
                    continue  # tag-soup fallback rows
                assert 0 <= s < e <= len(html)
                assert s >= prev_end
                prev_end = e
                # 3. the source slice normalizes back to the block text
                assert _norm_strip_tags(html[s:e]) == t
                checked += 1
        assert checked > 50  # the corpus must actually exercise spans
