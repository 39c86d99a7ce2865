"""Frozen-golden drift detection: today's kernels must reproduce the
committed extraction outputs byte-for-byte. An intentional semantic
change requires regenerating via tests/make_golden.py in the same
commit — anything else failing here is unintended drift."""

from __future__ import annotations

import pyarrow.parquet as pq

from tests.make_golden import (
    GOLDEN_PATH,
    HOSTILE_GOLDEN_PATH,
    compute_golden,
    compute_hostile_golden,
)


def test_kernels_match_frozen_golden():
    frozen = pq.read_table(GOLDEN_PATH).to_pylist()
    current = {r["url"]: r for r in compute_golden().to_pylist()}
    assert len(frozen) == len(current)
    mismatch = []
    for f in frozen:
        c = current[f["url"]]
        if c != f:
            mismatch.append((f["url"], f, c))
    assert not mismatch, "drift on %d urls, e.g. %s" % (
        len(mismatch), mismatch[:2]
    )


def test_hostile_html_matches_frozen_golden():
    """Adversarial HTML families (malformed encodings, script/style
    floods, 50-deep tables, CDATA/comment edges) — the byte-identity
    contract is only as strong as its worst fixture family."""
    frozen = pq.read_table(HOSTILE_GOLDEN_PATH).to_pylist()
    current = {r["url"]: r for r in compute_hostile_golden().to_pylist()}
    assert len(frozen) == len(current) >= 32
    mismatch = [
        (f["url"], f, current[f["url"]])
        for f in frozen
        if current[f["url"]] != f
    ]
    assert not mismatch, "hostile drift on %d urls, e.g. %s" % (
        len(mismatch), mismatch[:2]
    )


def test_hostile_families_extract_content():
    """Semantic pins independent of the frozen bytes: the needle
    sentence must survive each hostile family, and injected noise
    (script bodies, comments, CDATA, attribute payloads) must not."""
    rows = {r["url"].rsplit("/", 1)[-1]: r for r in
            compute_hostile_golden().to_pylist()}
    t = rows["heavy.html"]["extracted_text"]
    assert "only real sentence" in t and "injected" not in t
    assert "not content" not in t
    t = rows["tables-50.html"]["extracted_text"]
    assert "Needle paragraph at depth fifty." == t
    t = rows["fake-content.html"]["extracted_text"]
    assert "Visible sentence" in t and "commented-out" not in t
    t = rows["cdata.html"]["extracted_text"]
    assert "before the CDATA" in t and "after the CDATA" in t
    assert "not markup" not in t
    t = rows["markup-in-attr.html"]["extracted_text"]
    assert "must not leak" in t and "not bold" not in t
    t = rows["bom-prefixed.html"]["extracted_text"]
    assert t.startswith("BOM-prefixed")  # BOM stripped, not leaked
    assert rows["one-long-line.html"]["word_count"] == 1000
