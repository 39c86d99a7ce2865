"""Unigram-LM tokenizer (ml/unigram.py).

Full DuckDB value-hash (seed + EM + segmentation + encode) runs in
test_entry_contract.py; here: the integer 16.log2 kernel, the Viterbi
DP against brute-force enumeration, tie-break order, and the
pure-Catalyst candidate span table.
"""

from __future__ import annotations

import itertools
import math

import pyspark.sql.functions as F

from readur_spark.ml.unigram import (
    MAX_PIECE_LEN,
    candidate_pieces,
    log2_16,
    piece_weights,
    viterbi_best,
)


class TestLog216:
    def test_powers_of_two_exact(self):
        for e in range(0, 40):
            assert log2_16(1 << e) == 16 * e

    def test_monotone_and_near_float(self):
        prev = -1
        for x in range(1, 5000):
            v = log2_16(x)
            assert v >= prev
            prev = v
            assert abs(v - math.floor(16 * math.log2(x))) <= 1

    def test_matches_posting_sql_twin(self, spark):
        # the Spark-side log2_sixteenths must agree with the Python
        # twin on every value (shared algorithm, shared bits)
        from readur_spark.operators.posting import log2_sixteenths

        df = spark.range(1, 300).withColumnRenamed("id", "x")
        rows = log2_sixteenths(df, "x", "sb").collect()
        for r in rows:
            assert r["sb"] == log2_16(r["x"]), r["x"]


def _brute_force(word, weights, max_len=MAX_PIECE_LEN):
    best = None
    n = len(word)

    def rec(pos, sc, seg):
        nonlocal best
        if pos == n:
            key = (sc, seg)
            if best is None or sc > best[0] or (
                sc == best[0] and seg < best[1]
            ):
                best = key
            return
        for l in range(1, min(max_len, n - pos) + 1):
            p = word[pos : pos + l]
            if p in weights:
                rec(pos + l, sc + weights[p],
                    p if seg == "" else seg + " " + p)

    rec(0, 0, "")
    return best


class TestViterbi:
    def test_against_brute_force_exhaustive(self):
        # every word over {a,b} up to length 7, a vocab with mixed
        # lengths and deliberate score ties
        weights = {
            "a": -10, "b": -10, "ab": -20, "ba": -19,
            "aa": -21, "abab": -35, "bb": -18,
        }
        for n in range(1, 8):
            for tup in itertools.product("ab", repeat=n):
                w = "".join(tup)
                assert viterbi_best(w, weights) == _brute_force(
                    w, weights
                ), w

    def test_tie_prefers_lexicographic_seg(self):
        # 'a b' and 'ab' tie on score -> 'a b' (space < 'a')
        weights = {"a": -5, "b": -5, "ab": -10}
        assert viterbi_best("ab", weights) == (-10, "a b")

    def test_unsegmentable_raises(self):
        try:
            viterbi_best("axb", {"a": -1, "b": -1})
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError")

    def test_piece_weights_are_negative_logprobs(self):
        w = piece_weights({"a": 3, "b": 1})
        # total 4: w_a = L2(3) - L2(4) < 0, w_b = L2(1) - L2(4) = -32
        assert w["b"] == -32
        assert -32 < w["a"] < 0


class TestCandidatePieces:
    def test_values(self, spark):
        words = spark.createDataFrame([("aba", 2), ("ab", 1)], "w string, n long")
        got = {
            r["piece"]: r["score"]
            for r in candidate_pieces(words).collect()
        }
        # 'aba'x2: a(2 occ), b, ab, ba, aba; 'ab'x1: a, b, ab
        assert got == {
            "a": 5, "b": 3, "ab": 3, "ba": 2, "aba": 2,
        }

    def test_zero_python_plan(self, spark):
        words = spark.createDataFrame([("abc", 1)], "w string, n long")
        plan = (
            candidate_pieces(words)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan and "MapInPandas" not in plan
