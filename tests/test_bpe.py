"""ml/bpe.py — distributed BPE merge learning vs a plain-Python model."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.bpe import (
    apply_merge,
    encode_token_counts,
    learn_bpe_merges,
    rep_symbols,
    word_counts,
    word_to_rep,
)
from readur_spark.plans.audit import has_broadcast_join


# ---- plain-Python reference (canonical while-loop greedy BPE) ----------


def _py_words(texts: list[str]) -> dict[str, int]:
    words: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] = words.get(w, 0) + 1
    return words


def _py_apply(sym: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _py_learn(texts: list[str], k: int):
    words = _py_words(texts)
    reps = {w: list(w) for w in words}
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        pc: dict[tuple[str, str], int] = {}
        for w, n in words.items():
            s = reps[w]
            for pair in zip(s, s[1:]):
                pc[pair] = pc.get(pair, 0) + n
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, cnt))
        reps = {w: _py_apply(s, a, b) for w, s in reps.items()}
    return merges, reps


CORPUS = [
    "the cat sat on the mat",
    "the rat sat on the cat",
    "that cat and that rat chat",
    "matter scatter the thatch",
    "",  # no alphabetic tokens
]


def _docs(spark):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


class TestRepresentation:
    def test_rep_roundtrip(self, spark):
        df = spark.createDataFrame([("abc",), ("x",)], "w string")
        rows = df.select(
            word_to_rep(F.col("w")).alias("rep"),
            rep_symbols(word_to_rep(F.col("w"))).alias("syms"),
        ).collect()
        assert rows[0]["rep"] == "  a  b  c  "
        assert rows[0]["syms"] == ["a", "b", "c"]
        assert rows[1]["syms"] == ["x"]

    @pytest.mark.parametrize(
        "word,a,b,want",
        [
            ("aaa", "a", "a", ["aa", "a"]),       # greedy non-overlap
            ("aaaa", "a", "a", ["aa", "aa"]),
            ("abab", "a", "b", ["ab", "ab"]),     # shared-separator case
            ("xaby", "a", "b", ["x", "ab", "y"]),
            ("abc", "b", "a", ["a", "b", "c"]),   # no occurrence
        ],
    )
    def test_apply_merge_is_greedy_left_to_right(self, spark, word, a, b, want):
        df = spark.createDataFrame([(word,)], "w string")
        got = df.select(
            rep_symbols(
                apply_merge(word_to_rep(F.col("w")), a, b)
            ).alias("s")
        ).first()["s"]
        assert got == want
        assert got == _py_apply(list(word), a, b)


class TestLearn:
    @pytest.fixture(scope="class")
    def learned(self, spark):
        return learn_bpe_merges(_docs(spark), 6)

    def test_word_counts_match(self, spark):
        got = {
            r["w"]: r["n"] for r in word_counts(_docs(spark)).collect()
        }
        assert got == _py_words(CORPUS)

    def test_merges_match_python(self, learned):
        merges, _ = learned
        py_merges, _ = _py_learn(CORPUS, 6)
        assert merges == py_merges

    def test_final_vocab_matches_python(self, learned):
        _, vocab = learned
        _, py_reps = _py_learn(CORPUS, 6)
        got = {
            r["w"]: r["syms"]
            for r in vocab.select(
                "w", rep_symbols(F.col("rep")).alias("syms")
            ).collect()
        }
        assert got == py_reps

    def test_merges_cascade(self, learned):
        """Later merges must be able to consume earlier merged symbols
        (the property that distinguishes BPE from one-shot pair counts)."""
        merges, _ = learned
        singles = {m[1] for m in merges} | {m[2] for m in merges}
        assert any(len(m[1]) > 1 or len(m[2]) > 1 for m in merges), (
            f"no cascaded merge in {singles}"
        )


class TestEncode:
    def test_token_counts_match_python(self, spark):
        _, vocab = learn_bpe_merges(_docs(spark), 6)
        got = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
            for r in encode_token_counts(_docs(spark), vocab).collect()
        }
        _, py_reps = _py_learn(CORPUS, 6)
        want = {}
        for i, t in enumerate(CORPUS):
            ws = [w for w in re.split(r"[^a-z]+", t.lower()) if w]
            if ws:
                want[i + 1] = (len(ws), sum(len(py_reps[w]) for w in ws))
        assert got == want

    def test_empty_doc_excluded(self, spark):
        _, vocab = learn_bpe_merges(_docs(spark), 2)
        ids = {
            r["doc_id"]
            for r in encode_token_counts(_docs(spark), vocab).collect()
        }
        assert 5 not in ids

    def test_encode_vocab_join_broadcasts(self, spark):
        _, vocab = learn_bpe_merges(_docs(spark), 2)
        out = encode_token_counts(_docs(spark), vocab)
        assert has_broadcast_join(out)
