"""Unit tests for Luhn card PII, unigram entropy, and Zipf fit —
hand-computed values and known-answer checksums."""

import math

import pytest
from pyspark.sql import functions as F

from readur_spark.ml.infostats import unigram_entropy, zipf_fit
from readur_spark.ml.pii_cards import (
    card_candidates,
    luhn_valid,
    redact_cards,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestLuhn:
    # known-answer vectors: industry test PANs (valid) and mutations
    VALID = ["4532015112830366", "4111111111111111", "5500005555555559",
             "79927398713"]
    INVALID = ["4532015112830367", "4111111111111112", "1234567812345678"]

    def test_known_vectors(self, spark):
        df = spark.createDataFrame(
            [(n,) for n in self.VALID + self.INVALID], "num string"
        )
        got = {r["num"]: r["ok"]
               for r in df.select("num", luhn_valid("num").alias("ok")).collect()}
        for n in self.VALID:
            assert got[n] is True, n
        for n in self.INVALID:
            assert got[n] is False, n

    def test_candidates_and_redaction(self, spark):
        df = _docs(
            spark,
            [(1, "pay 4532015112830366 or 4532015112830367 ok"),
             (2, "short 123456 run and no card")],
        )
        cand = card_candidates(df).collect()
        assert {(r["doc_id"], r["num"], r["luhn_ok"]) for r in cand} == {
            (1, "4532015112830366", True),
            (1, "4532015112830367", False),
        }
        red = {r["doc_id"]: r["t"]
               for r in df.select("doc_id",
                                  redact_cards(F.col("text")).alias("t")).collect()}
        assert red[1] == "pay <CARD> or <CARD> ok"
        assert red[2] == "short 123456 run and no card"

    def test_pure_catalyst_no_python(self, spark):
        df = _docs(spark, [(1, "x 4532015112830366 y")])
        plan = card_candidates(df)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan  # zero Python in the operator


class TestEntropy:
    def test_hand_computed(self, spark):
        # "a a b b" -> p = [.5, .5] -> H = 1 bit
        # "a a a a" -> H = 0
        # "a b c d" -> H = 2 bits
        df = _docs(spark, [(1, "a a b b"), (2, "a a a a"), (3, "a b c d")])
        out = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy_bits"])
               for r in unigram_entropy(df).collect()}
        assert out[1] == (4, 2, 1.0)
        assert out[2] == (4, 1, 0.0)
        assert out[3] == (4, 4, 2.0)

    def test_skewed_distribution(self, spark):
        # "a a a b": H = -(3/4 log2 3/4 + 1/4 log2 1/4) ≈ 0.811
        df = _docs(spark, [(1, "a a a b")])
        h = unigram_entropy(df).collect()[0]["entropy_bits"]
        want = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
        assert h == round(want, 3)


class TestZipf:
    def test_perfect_zipf_slope(self, spark):
        # construct freq(rank) = round(720 / rank) for ranks 1..6 via
        # token repetition -> slope must be close to -1
        toks = []
        for rank, tok in enumerate(
            ["t1", "t2", "t3", "t4", "t5", "t6"], start=1
        ):
            toks.extend([tok] * round(720 / rank))
        df = _docs(spark, [(1, " ".join(toks))])
        row = zipf_fit(df, top_k=6).collect()[0]
        assert row["n_ranked"] == 6
        assert abs(row["slope"] + 1.0) < 0.01

    def test_uniform_corpus_slope_zero(self, spark):
        df = _docs(spark, [(1, "x y z w " * 10)])
        row = zipf_fit(df, top_k=4).collect()[0]
        assert row["slope"] == 0.0


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))


class TestDomainDiversity:
    def test_bounds_at_fixture_scale(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["domain_diversity_by_lang"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows and all(
            1.0 <= r["effective_domains"] <= r["n_domains"] for r in rows
        )

    def test_extremes(self, spark):
        import pyspark.sql.functions as F

        # 4 docs from one domain -> effective 1; 4 domains evenly -> 4
        df = spark.createDataFrame(
            [("en", "a")] * 4 + [("fr", s) for s in "abcd"],
            ["lang", "source"],
        )
        c = df.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
        h = F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        out = {
            r["lang"]: r["effective_domains"]
            for r in c.groupBy("lang")
            .agg(F.round(F.pow(F.lit(2.0), h), 3).alias("effective_domains"))
            .collect()
        }
        assert out == {"en": 1.0, "fr": 4.0}


class TestLexicalRichness:
    def test_hand_computed(self, spark):
        from readur_spark.ml.infostats import lexical_richness

        # doc 1: "a a a b" -> counts {a:3, b:1}; N=4 V=2 S2=10 S11=6
        #   yule  = (10^7 * (10-4)) // 16         = 3_750_000
        #   simp  = (10^6 * 6) // (4*3)           = 500_000
        #   ttr   = (10^3 * 2) // 4               = 500
        # doc 2: "x y z" all distinct -> S2=N -> yule 0, simpson 0
        # doc 3: single token -> simpson NULL (N-1 = 0 guard)
        df = _docs(spark, [(1, "a a a b"), (2, "x y z"), (3, "solo")])
        got = {r["doc_id"]: r for r in lexical_richness(df).collect()}
        assert got[1]["n_tokens"] == 4 and got[1]["n_distinct"] == 2
        assert got[1]["yule_k_milli"] == 3_750_000
        assert got[1]["simpson_ppm"] == 500_000
        assert got[1]["ttr_milli"] == 500
        assert got[2]["yule_k_milli"] == 0
        assert got[2]["simpson_ppm"] == 0
        assert got[2]["ttr_milli"] == 1000
        assert got[3]["simpson_ppm"] is None
        assert got[3]["ttr_milli"] == 1000

    def test_pure_catalyst(self, spark):
        from readur_spark.ml.infostats import lexical_richness

        plan = (
            lexical_richness(_docs(spark, [(1, "a b")]))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan
