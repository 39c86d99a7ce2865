"""Frozen-golden drift detection: today's kernels must reproduce the
committed extraction outputs byte-for-byte. An intentional semantic
change requires regenerating via tests/make_golden.py in the same
commit — anything else failing here is unintended drift."""

from __future__ import annotations

import pyarrow.parquet as pq

from tests.make_golden import GOLDEN_PATH, compute_golden


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
