"""ml/dsir.py — DSIR-style hashed n-gram importance selection."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.dsir import (
    BUCKET_HEX_LEN,
    dsir_scores,
    dsir_top_k,
    feature_buckets,
)
from readur_spark.plans.audit import has_broadcast_join


def _py_buckets(text: str) -> list[str]:
    toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        hashlib.md5(g.encode()).hexdigest()[:BUCKET_HEX_LEN] for g in grams
    ]


def _py_scores(rows: list[tuple[int, str, bool]]) -> dict[int, int]:
    """Reference model in plain Python, mirroring the docstring math."""
    c_r: dict[str, int] = {}
    c_t: dict[str, int] = {}
    per_doc: dict[int, list[str]] = {}
    for doc_id, text, is_target in rows:
        bs = _py_buckets(text)
        per_doc[doc_id] = bs
        for b in bs:
            c_r[b] = c_r.get(b, 0) + 1
            if is_target:
                c_t[b] = c_t.get(b, 0) + 1
    t_r = sum(c_r.values())
    t_t = sum(c_t.values())

    def bits(total: int, c: int) -> int:
        q = total // (c + 1)
        return 0 if q == 0 else math.floor(math.log2(q))

    return {
        d: sum(bits(t_r, c_r[b]) - bits(t_t, c_t.get(b, 0)) for b in bs)
        for d, bs in per_doc.items()
        if bs
    }


CORPUS = [
    # target-looking docs: share the "the quick brown fox" phrase pool
    (1, "The quick brown fox jumps over the lazy dog.", True),
    (2, "A quick brown fox and the lazy dog again.", True),
    (3, "The fox jumps; the dog sleeps. Quick quick fox.", True),
    # raw-only docs: disjoint vocabulary
    (4, "zzz qqq xxx vvv kkk zzz qqq xxx", False),
    (5, "lorem ipsum dolor sit amet consectetur", False),
    # mixed: some target phrases, some junk
    (6, "The quick fox meets lorem ipsum dolor.", False),
    (7, "", False),  # no alphabetic tokens: excluded
]


class TestFeatureBuckets:
    def test_matches_python_hashing(self, spark):
        text = "The quick brown fox! 42 jumps."
        df = spark.createDataFrame([(text,)], "t string")
        got = df.select(
            feature_buckets(F.col("t")).alias("bs")
        ).first()["bs"]
        assert got == _py_buckets(text)

    def test_single_token_has_no_bigrams(self, spark):
        df = spark.createDataFrame([("word",)], "t string")
        got = df.select(
            feature_buckets(F.col("t")).alias("bs")
        ).first()["bs"]
        assert got == _py_buckets("word")
        assert len(got) == 1


class TestDsirScores:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        docs = spark.createDataFrame(
            CORPUS, "doc_id long, text string, is_target boolean"
        )
        return {
            r["doc_id"]: r
            for r in dsir_scores(docs, F.col("is_target")).collect()
        }

    def test_exact_vs_python_model(self, scored):
        expect = _py_scores(CORPUS)
        assert {d: r["sum_dbits"] for d, r in scored.items()} == expect

    def test_zero_token_doc_excluded(self, scored):
        assert 7 not in scored

    def test_target_docs_outscore_raw_only(self, scored):
        worst_target = min(scored[d]["sum_dbits"] for d in (1, 2, 3))
        best_raw = max(scored[d]["sum_dbits"] for d in (4, 5))
        assert worst_target > best_raw
        assert all(scored[d]["selected"] for d in (1, 2, 3))
        assert not any(scored[d]["selected"] for d in (4, 5))

    def test_selected_is_sign_test(self, scored):
        for r in scored.values():
            assert r["selected"] == (r["sum_dbits"] > 0)


class TestScaleShape:
    def test_model_join_broadcasts(self, spark):
        docs = spark.createDataFrame(
            CORPUS, "doc_id long, text string, is_target boolean"
        )
        out = dsir_scores(docs, F.col("is_target"))
        assert has_broadcast_join(out)

    def test_top_k_is_take_ordered(self, spark):
        docs = spark.createDataFrame(
            CORPUS, "doc_id long, text string, is_target boolean"
        )
        top = dsir_top_k(docs, F.col("is_target"), 2)
        plan = top._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        ids = [r["doc_id"] for r in top.collect()]
        assert len(ids) == 2
        assert set(ids) <= {1, 2, 3}
