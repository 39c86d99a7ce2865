"""ml/quality_lm.py — CCNet-style unigram-LM surprisal filtering."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.quality_lm import (
    HEAD_MAX_CBITS,
    MIDDLE_MAX_CBITS,
    int_log2,
    score_unigram_surprisal,
    tokenize_alpha,
    unigram_vocab,
)
from readur_spark.plans.audit import has_broadcast_join


class TestPrimitives:
    def test_int_log2_exact(self, spark):
        """Exact floor(log2) including powers of two, where libm log2
        can land on 2.9999... and floor() the wrong way."""
        vals = [1, 2, 3, 4, 7, 8, 9, 1023, 1024, 1025, 2**40, 2**40 + 1]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        got = {
            r["x"]: r["b"]
            for r in df.select("x", int_log2(F.col("x")).alias("b")).collect()
        }
        for v in vals:
            assert got[v] == math.floor(math.log2(v)), v

    def test_int_log2_zero(self, spark):
        df = spark.createDataFrame([(0,)], "x long")
        assert df.select(int_log2(F.col("x")).alias("b")).first()["b"] == 0

    def test_tokenize_alpha(self, spark):
        df = spark.createDataFrame([("Foo, bar! 42 baz-qux ",)], "t string")
        row = df.select(tokenize_alpha(F.col("t")).alias("w")).first()
        assert row["w"] == ["foo", "bar", "baz", "qux"]


class TestScoring:
    def test_hand_computed_corpus(self, spark):
        """T = 6 tokens: the(3), cat(2), sat(1).
        bits(the) = floor(log2(6 div 4)) = 0
        bits(cat) = floor(log2(6 div 3)) = 1
        bits(sat) = floor(log2(6 div 2)) = 1  (log2(3) floors to 1)"""
        docs = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the the cat")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in score_unigram_surprisal(docs).collect()
        }
        assert got[1]["n_tokens"] == 3 and got[1]["sum_bits"] == 0 + 1 + 1
        assert got[2]["n_tokens"] == 3 and got[2]["sum_bits"] == 0 + 0 + 1
        assert got[1]["mean_cbits"] == (100 * 2) // 3  # 66

    def test_oov_gets_full_surprisal(self, spark):
        """With the vocab capped to 2 types, the rarest type falls out
        and scores floor(log2(T div 1)) = floor(log2(T))."""
        docs = spark.createDataFrame(
            [(1, "aa aa aa aa bb bb bb cc")], "doc_id long, text string"
        )
        out = score_unigram_surprisal(docs, vocab_cap=2).first()
        # T=8; aa: 8 div 5 = 1 -> 0 bits; bb: 8 div 4 = 2 -> 1 bit;
        # cc OOV: 8 div 1 = 8 -> 3 bits
        assert out["sum_bits"] == 0 * 4 + 1 * 3 + 3

    def test_empty_doc_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, "real words here"), (2, "   12345 !!! "), (3, None)],
            "doc_id long, text string",
        )
        ids = [r["doc_id"] for r in score_unigram_surprisal(docs).collect()]
        assert ids == [1]

    def test_bucket_arms(self, spark):
        """Fluent repetition scores head; unique-gibberish docs in a
        large mixed corpus score tail (every token near-OOV-rare)."""
        def uniq_word(n: int) -> str:
            # letters-only base-26 encoding, 6 chars -> globally unique
            return "".join(chr(97 + (n // 26**k) % 26) for k in range(6))

        rows = [(i, "the quick brown fox " * 20) for i in range(50)]
        rows += [
            (1000 + i, " ".join(uniq_word(i * 40 + j) for j in range(40)))
            for i in range(50)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = score_unigram_surprisal(docs)
        buckets = {
            r["doc_id"]: r["ppl_bucket"] for r in out.collect()
        }
        assert all(buckets[i] == "head" for i in range(50))
        assert all(buckets[1000 + i] == "tail" for i in range(50))
        cbits = {r["doc_id"]: r["mean_cbits"] for r in out.collect()}
        assert max(cbits[i] for i in range(50)) < HEAD_MAX_CBITS
        assert min(cbits[1000 + i] for i in range(50)) >= MIDDLE_MAX_CBITS

    def test_deterministic_under_repartition(self, spark):
        rows = [(i, f"alpha beta w{i % 17} gamma") for i in range(300)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, score_unigram_surprisal(docs).collect()))
        b = sorted(
            map(tuple, score_unigram_surprisal(docs.repartition(13)).collect())
        )
        assert a == b


class TestPlanShape:
    def test_vocab_broadcast_no_python(self, spark):
        rows = [(i, f"tok{i % 5} tok{i % 3}") for i in range(100)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = score_unigram_surprisal(docs)
        assert has_broadcast_join(out)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan

    def test_vocab_total_counts_tail_types(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string"
        )
        toks = docs.select(
            "doc_id", F.explode(tokenize_alpha(F.col("text"))).alias("token")
        )
        vocab, total = unigram_vocab(toks, cap=1)
        assert total == 6  # includes the capped-out b and c
        assert vocab.count() == 1


class TestBigramScoring:
    def test_hand_computed(self, spark):
        """corpus bigrams: (the,cat) x2, (cat,sat) x1, (the,dog) x1.
        c_prev: the=3, cat=1.
        doc 1 'the cat sat': (the,cat): 3 div 3 = 1 -> 0 bits;
                             (cat,sat): 1 div 2 = 0 -> 0 bits.
        doc 2 'the cat':     (the,cat): 0 bits.
        doc 3 'the dog':     (the,dog): 3 div 2 = 1 -> 0 bits."""
        from readur_spark.ml.quality_lm import score_bigram_surprisal

        docs = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the cat"), (3, "the dog")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in score_bigram_surprisal(docs).collect()}
        assert got[1]["n_bigrams"] == 2 and got[1]["sum_bits"] == 0
        assert got[2]["n_bigrams"] == 1
        assert got[3]["sum_bits"] == 0

    def test_unseen_bigram_costs_context_bits(self, spark):
        """With 'the' appearing 8x as context, an unseen continuation
        (c_bg=0) costs floor(log2(8 div 1)) = 3 bits... measured via a
        doc whose bigram is rare: (the, zzz) occurs once -> c_bg=1,
        bits = floor(log2(9 div 2)) = 2."""
        from readur_spark.ml.quality_lm import score_bigram_surprisal

        rows = [(i, "the end") for i in range(8)] + [(100, "the zzz")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in score_bigram_surprisal(docs).collect()}
        # c_prev(the)=9; doc100 (the,zzz): c_bg=1 -> 9 div 2 = 4 -> 2 bits
        assert got[100]["sum_bits"] == 2
        # (the,end): c_bg=8 -> 9 div 9 = 1 -> 0 bits
        assert got[0]["sum_bits"] == 0

    def test_short_docs_excluded(self, spark):
        from readur_spark.ml.quality_lm import score_bigram_surprisal

        docs = spark.createDataFrame(
            [(1, "single"), (2, ""), (3, "two tokens")],
            "doc_id long, text string",
        )
        assert [r["doc_id"] for r in score_bigram_surprisal(docs).collect()] == [3]

    def test_jvm_only_plan(self, spark):
        from readur_spark.ml.quality_lm import score_bigram_surprisal

        docs = spark.createDataFrame(
            [(i, f"alpha beta w{i % 5} gamma") for i in range(50)],
            "doc_id long, text string",
        )
        out = score_bigram_surprisal(docs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan


class TestSinglePassVocab:
    """VERDICT r3 item 3: the LM scorer must not re-explode the corpus
    for T or the vocab — both derive from ONE grouped (token, c) agg,
    and the final query plan explodes the token stream exactly once."""

    def test_unigram_final_plan_has_one_generate(self, spark):
        from readur_spark.ml.quality_lm import score_unigram_surprisal

        docs = spark.createDataFrame(
            [(i, f"alpha beta w{i % 7} gamma delta") for i in range(60)],
            "doc_id long, text string",
        )
        out = score_unigram_surprisal(docs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate") == 1, plan
        # vocab rides as a local relation (collected once at build),
        # so the scoring join needs no second aggregation of the corpus
        assert "Python" not in plan and "ArrowEval" not in plan

    def test_bigram_final_plan_has_one_generate(self, spark):
        from readur_spark.ml.quality_lm import score_bigram_surprisal

        docs = spark.createDataFrame(
            [(i, f"alpha beta w{i % 7} gamma delta") for i in range(60)],
            "doc_id long, text string",
        )
        out = score_bigram_surprisal(docs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate") == 1, plan

    def test_vocab_total_equals_stream_count(self, spark):
        from pyspark.sql import functions as F
        from readur_spark.ml.quality_lm import tokenize_alpha, unigram_vocab

        docs = spark.createDataFrame(
            [(1, "a b c a"), (2, "b b"), (3, "")],
            "doc_id long, text string",
        )
        toks = docs.select(
            "doc_id", F.explode(tokenize_alpha(F.col("text"))).alias("token")
        )
        vocab, total = unigram_vocab(toks, cap=2)
        assert total == 6  # T covers ALL evidence, beyond the cap
        got = {r["token"]: r["c"] for r in vocab.collect()}
        assert got == {"b": 3, "a": 2}  # capped, count-desc ties by token
