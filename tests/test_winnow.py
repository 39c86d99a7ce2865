"""ml/winnow.py — winnowing fingerprints (MOSS) + reuse pairs."""

from __future__ import annotations

import hashlib

import pytest

from readur_spark.ml.winnow import (
    K_GRAM,
    PREFIX_CAP,
    W_WINDOW,
    winnow_fingerprints,
    winnow_reuse_pairs,
)


def _py_winnow(text: str, k: int = K_GRAM, w: int = W_WINDOW,
               cap: int = PREFIX_CAP) -> set[tuple[int, int]]:
    """Plain-Python replay: leftmost-min-of-(hash, pos) per full
    window over 60-bit md5 k-gram hashes; 1-based positions."""
    s = text[:cap]
    n = len(s) - k + 1
    if n < w:
        return set()
    hs = [
        int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16)
        for i in range(n)
    ]
    out: set[tuple[int, int]] = set()
    for j in range(n - w + 1):
        window = [(hs[j + t], j + t + 1) for t in range(w)]
        out.add(min(window)[::-1])  # (pos, fp)
    return out


SAMPLE = (
    "The quick brown fox jumps over the lazy dog while the quick brown "
    "fox naps in the noonday sun beside a slow green river bank."
)


class TestKernelVsPython:
    def test_exact_vs_python(self, spark):
        df = spark.createDataFrame([(1, SAMPLE)], "doc_id long, text string")
        got = {
            (r["pos"], r["fp"]) for r in winnow_fingerprints(df).collect()
        }
        assert got == _py_winnow(SAMPLE)
        assert len(got) > 5  # non-vacuous

    def test_short_texts_yield_nothing(self, spark):
        too_short = "abcd"  # < k chars
        no_window = "abcdefgh"  # k-grams exist but no full window
        df = spark.createDataFrame(
            [(1, too_short), (2, no_window), (3, "")],
            "doc_id long, text string",
        )
        assert winnow_fingerprints(df).collect() == []


class TestGuarantee:
    def test_shared_substring_guarantee(self, spark):
        """Any shared substring of length >= w + k - 1 inside the
        capped prefix must yield >= 1 shared fingerprint — the
        winnowing detection guarantee (Schleimer et al. theorem 1)."""
        shared = "zqxjkvwpbyfgmdn eachword uniq"  # 29 chars >= w+k-1
        a = "AAAA " + shared + " tail of document alpha here"
        b = "completely different head " + shared + " omega"
        df = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        fps = winnow_fingerprints(df).collect()
        set_a = {r["fp"] for r in fps if r["id"] == 1}
        set_b = {r["fp"] for r in fps if r["id"] == 2}
        assert set_a & set_b

    def test_exact_dups_share_everything_and_pair(self, spark):
        df = spark.createDataFrame(
            [(1, SAMPLE), (2, SAMPLE), (3, "an unrelated short text body "
                                           "with its own distinct words")],
            "doc_id long, text string",
        )
        fps = winnow_fingerprints(df)
        rows = fps.collect()
        assert {(r["pos"], r["fp"]) for r in rows if r["id"] == 1} == {
            (r["pos"], r["fp"]) for r in rows if r["id"] == 2
        }
        pairs = {
            (r["id_a"], r["id_b"]): r["n_shared"]
            for r in winnow_reuse_pairs(fps, min_shared=3).collect()
        }
        assert (1, 2) in pairs
        # n_shared counts DISTINCT shared fingerprints (the posting
        # join dedups per doc); one fp may be selected at several pos
        assert pairs[(1, 2)] == len(
            {fp for _, fp in _py_winnow(SAMPLE, cap=PREFIX_CAP)}
        )

    def test_df_cap_drops_boilerplate_fingerprints(self, spark):
        # the same prefix in MANY docs -> its fingerprints exceed the
        # cap and produce no pairs (boilerplate, not reuse)
        rows = [(i, SAMPLE) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = winnow_reuse_pairs(
            winnow_fingerprints(df), df_cap=20, min_shared=1
        ).collect()
        assert pairs == []
