"""Content-defined chunking (ml/cdc.py) — the rows-only algorithmic
contract: the vectorized kernel equals the pure-Python reference, all
chunks respect the MIN/MAX bounds, chunks reassemble byte-identically,
and boundaries after an edit point are unchanged (the property CDC
exists for, which fixed-size blocking provably lacks)."""

import hashlib

import numpy as np
import pytest

from readur_spark.ml.cdc import (
    CDC_MAX,
    CDC_MIN,
    _boundaries_np,
    chunk_boundaries,
    chunk_table,
    dedup_rollup,
    gear_table,
)


def _payload(seed: bytes, n: int) -> bytes:
    out = bytearray()
    h = seed
    while len(out) < n:
        h = hashlib.md5(h).digest()
        out.extend(h)
    return bytes(out[:n])


GEAR_NP = np.array(gear_table(), dtype=np.uint64)


class TestKernel:
    @pytest.mark.parametrize("n", [0, 1, 255, 256, 257, 1024, 4096, 40000])
    def test_numpy_equals_reference(self, n):
        data = _payload(b"k", n)
        assert _boundaries_np(data, GEAR_NP) == chunk_boundaries(data)

    def test_bounds_and_coverage(self):
        data = _payload(b"b", 100_000)
        cuts = _boundaries_np(data, GEAR_NP)
        assert cuts[-1] == len(data)
        prev = 0
        for c in cuts:
            assert CDC_MIN <= c - prev <= CDC_MAX or c == len(data)
            prev = c

    def test_reassembly_identity(self):
        data = _payload(b"r", 30_000)
        cuts = _boundaries_np(data, GEAR_NP)
        prev, parts = 0, []
        for c in cuts:
            parts.append(data[prev:c])
            prev = c
        assert b"".join(parts) == data

    def test_average_chunk_size_in_design_band(self):
        data = _payload(b"a", 500_000)
        cuts = _boundaries_np(data, GEAR_NP)
        avg = len(data) / len(cuts)
        # expected ~ CDC_MIN + 2^10; allow a wide deterministic band
        assert 600 < avg < 3000

    def test_boundary_shift_invariance(self):
        """Insert 10 bytes near the front: every boundary beyond the
        edit neighborhood survives (shifted by the insertion), so all
        later chunk digests are reused — THE dedup property."""
        base = _payload(b"s", 60_000)
        edited = base[:100] + b"0123456789" + base[100:]
        cb = chunk_boundaries(base)
        ce = chunk_boundaries(edited)
        # compare digests of chunks, not offsets
        def digests(data, cuts):
            prev, out = 0, []
            for c in cuts:
                out.append(hashlib.md5(data[prev:c]).hexdigest())
                prev = c
            return out

        db, de = digests(base, cb), digests(edited, ce)
        # all but the first few chunks are identical content
        tail = min(len(db), len(de)) - 3
        assert tail > 10
        assert db[-tail:] == de[-tail:]

    def test_fixed_size_blocking_lacks_the_property(self):
        """The control: 1 KiB fixed blocks share (almost) nothing
        after a 10-byte insertion — motivates CDC in the docstring."""
        base = _payload(b"s", 60_000)
        edited = base[:100] + b"0123456789" + base[100:]
        fb = {hashlib.md5(base[i:i + 1024]).hexdigest()
              for i in range(0, len(base), 1024)}
        fe = {hashlib.md5(edited[i:i + 1024]).hexdigest()
              for i in range(0, len(edited), 1024)}
        assert len(fb & fe) <= 1  # only the untouched first block


class TestSparkSurface:
    def test_chunk_table_matches_kernel_and_rolls_up(self, spark):
        rows = [("u1", _payload(b"x", 9000)), ("u2", _payload(b"y", 5000)),
                ("dup", _payload(b"x", 9000)), ("empty", b"")]
        df = spark.createDataFrame(rows, "url STRING, payload BINARY")
        chunks = chunk_table(df).collect()
        by_url = {}
        for r in chunks:
            by_url.setdefault(r["url"], []).append(r)
        for url, payload in rows:
            cuts = chunk_boundaries(payload)
            got = sorted(by_url.get(url, []), key=lambda r: r["idx"])
            assert [r["off"] + r["length"] for r in got] == cuts
            for r in got:
                seg = payload[r["off"]:r["off"] + r["length"]]
                assert r["digest"] == hashlib.md5(seg).hexdigest()[:16]
        # u1 and dup are byte-identical -> their digest sequences match
        assert [r["digest"] for r in sorted(by_url["u1"], key=lambda r: r["idx"])] \
            == [r["digest"] for r in sorted(by_url["dup"], key=lambda r: r["idx"])]
        roll = dedup_rollup(chunk_table(df)).collect()[0]
        assert roll["total_bytes"] == 9000 + 5000 + 9000
        assert roll["stored_bytes"] == 9000 + 5000  # dup fully deduped
        assert roll["stored_permille"] == (1000 * 14000) // 23000
        assert roll["n_distinct"] < roll["n_chunks"]
