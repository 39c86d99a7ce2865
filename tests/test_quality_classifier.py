"""ml/quality_classifier.py — gate-distilled Naive Bayes quality
classifier (fasttext-analog train + score, integer-exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from readur_spark.ml.quality_classifier import (
    score_nb,
    train_nb_llr,
)
from readur_spark.ml.quality_lm import tokenize_alpha


def _toks(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    return df.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )


class TestTraining:
    def test_hand_computed_llr(self, spark):
        """pos stream: 'good good fine' (T_pos=3); neg: 'bad bad bad spam'
        (T_neg=4).
        good: c_pos=2, c_neg=0 → bits_pos=floor(log2(3//3))=0,
              bits_neg=floor(log2(4//1))=2 → llr=+2
        bad:  c_pos=0, c_neg=3 → bits_pos=floor(log2(3//1))=1,
              bits_neg=floor(log2(4//4))=0 → llr=-1
        fine: c_pos=1, c_neg=0 → bits_pos=floor(log2(3//2))=0,
              bits_neg=2 → llr=+2
        spam: c_pos=0, c_neg=1 → bits_pos=1, bits_neg=floor(log2(4//2))=1
              → llr=0
        prior (OOV) = floor(log2(5)) - floor(log2(4)) = 2 - 2 = 0."""
        toks = _toks(
            spark,
            [(1, "good good fine", 1), (2, "bad bad bad spam", 0)],
        )
        model, prior = train_nb_llr(toks)
        got = {r["token"]: r["llr_bits"] for r in model.collect()}
        assert got == {"good": 2, "bad": -1, "fine": 2, "spam": 0}
        assert prior == 0

    def test_cap_is_deterministic(self, spark):
        """Ties on total count break by token asc — same winners on
        every engine/partitioning."""
        toks = _toks(spark, [(1, "b a d c", 1), (2, "c d a b", 0)])
        model, _ = train_nb_llr(toks, vocab_cap=2)
        kept = sorted(r["token"] for r in model.collect())
        assert kept == ["a", "b"]

    def test_model_is_local_relation(self, spark):
        """The collected model rebuilds as a literal table, so scoring
        broadcasts it without re-running training."""
        toks = _toks(spark, [(1, "x y", 1), (2, "y z", 0)])
        model, _ = train_nb_llr(toks)
        assert "LocalTableScan" in model._jdf.queryExecution().executedPlan().toString() or model.count() == 3


class TestScoring:
    def test_separates_lexically_distinct_classes(self, spark):
        """Where classes genuinely differ lexically, the classifier
        separates them perfectly — the non-degeneracy pin the sf0.01
        fixture (shared vocabulary by construction) cannot provide."""
        rows = []
        for i in range(20):
            rows.append((i, "clean prose sentence with genuine words here", 1))
        for i in range(20, 40):
            rows.append((i, "zz qq xx vv kk jj ww yy", 0))
        docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
        toks = docs.select(
            "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
        )
        model, prior = train_nb_llr(toks)
        scored = score_nb(docs, model, prior)
        got = {
            r["doc_id"]: r["predicted"]
            for r in scored.collect()
        }
        for i in range(20):
            assert got[i] == 1, i
        for i in range(20, 40):
            assert got[i] == 0, i

    def test_oov_scores_prior(self, spark):
        """A doc of never-seen tokens scores prior_bits per token."""
        train = _toks(spark, [(1, "aa aa", 1), (2, "bb", 0)])
        model, prior = train_nb_llr(train)
        probe = spark.createDataFrame(
            [(99, "unseen tokens entirely")], "doc_id long, text string"
        )
        row = score_nb(probe, model, prior).first()
        assert row["n_tokens"] == 3
        assert row["sum_llr"] == 3 * prior

    def test_zero_token_docs_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, "real words", 1), (2, "123 456 !!!", 0)],
            "doc_id long, text string, label int",
        )
        toks = docs.select(
            "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
        )
        model, prior = train_nb_llr(toks)
        ids = [r["doc_id"] for r in score_nb(docs, model, prior).collect()]
        assert ids == [1]

    def test_single_explode_in_scoring_plan(self, spark):
        """The scoring plan explodes the corpus once — the model is a
        broadcast literal, not a recomputed subtree."""
        docs = spark.createDataFrame(
            [(1, "a b c", 1), (2, "c d", 0)],
            "doc_id long, text string, label int",
        )
        toks = docs.select(
            "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
        )
        model, prior = train_nb_llr(toks)
        plan = (
            score_nb(docs, model, prior)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Generate explode") == 1, plan


class TestDomainTopK:
    def test_keeps_best_k_deterministically(self, spark):
        """Higher scores win; equal scores break by doc_id asc."""
        from pyspark.sql import Window

        scored = spark.createDataFrame(
            [(1, "d1", 50), (2, "d1", 90), (3, "d1", 90), (4, "d2", 10)],
            "doc_id long, source string, mean_cllr long",
        )
        ranked = scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.col("mean_cllr").desc(), "doc_id"
                )
            ),
        )
        kept = {
            r["doc_id"]: r["rank"]
            for r in ranked.filter(F.col("rank") <= 2).collect()
        }
        assert kept == {2: 1, 3: 2, 4: 1}

    def test_registered_query_truncates(self, spark):
        """At sf0.01 the 20-per-domain cap bites: fewer rows out than
        scored docs, max rank == cap in full domains."""
        from readur_spark.ml.quality_classifier import (
            TOPK_PER_DOMAIN,
            domain_topk_quality,
        )

        out = domain_topk_quality(spark, "/root/testdata/sf0.01")
        rows = out.collect()
        assert 0 < len(rows) < 500
        assert max(r["rank"] for r in rows) == TOPK_PER_DOMAIN


class TestReliability:
    def test_monotone_on_separable_corpus(self, spark):
        from readur_spark.ml.quality_classifier import (
            reliability_table,
            score_nb,
            train_nb_llr,
        )

        rows = []
        for i in range(20):
            rows.append((i, "clean prose sentence with genuine words here", 1))
        for i in range(20, 40):
            rows.append((i, "zz qq xx vv kk jj ww yy", 0))
        docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
        toks = docs.select(
            "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
        )
        model, prior = train_nb_llr(toks)
        scored = score_nb(docs, model, prior).join(
            docs.select("doc_id", "label"), "doc_id"
        )
        tbl = sorted(reliability_table(scored).collect(),
                     key=lambda r: r["bin"])
        # separable corpus → positives and negatives land in distinct
        # bins, positive rate rises from 0 to 1000 permille
        assert tbl[0]["pos_permille"] == 0
        assert tbl[-1]["pos_permille"] == 1000
        rates = [r["pos_permille"] for r in tbl]
        assert rates == sorted(rates)
        assert sum(r["n_docs"] for r in tbl) == 40

    def test_negative_bin_floor_semantics(self, spark):
        from readur_spark.ml.quality_classifier import reliability_table

        # mean_cllr -30 must floor to bin -2 (not truncate to -1)
        df = spark.createDataFrame(
            [(1, -30, 0), (2, 30, 1)],
            "doc_id long, mean_cllr long, label int",
        )
        got = {r["bin"]: r for r in reliability_table(df).collect()}
        assert set(got) == {-2, 1}


class TestIsotonic:
    def test_pav_pools_violators(self, spark):
        from readur_spark.ml.quality_classifier import isotonic_calibration

        # rates 0 / 500 / 200 / 800 with equal bin mass: PAV pools the
        # 500/200 violation into (5+2)/(10+10) = 350‰
        rows = [(-1, 10, 0, 0), (0, 10, 5, 500),
                (1, 10, 2, 200), (2, 10, 8, 800)]
        df = spark.createDataFrame(
            rows, "bin long, n_docs long, n_pos long, pos_permille long"
        )
        got = {r["bin"]: r["iso_permille"]
               for r in isotonic_calibration(df).collect()}
        assert got == {-1: 0, 0: 350, 1: 350, 2: 800}

    def test_already_monotone_is_identity(self, spark):
        from readur_spark.ml.quality_classifier import isotonic_calibration

        rows = [(0, 10, 1, 100), (1, 10, 5, 500), (2, 10, 9, 900)]
        df = spark.createDataFrame(
            rows, "bin long, n_docs long, n_pos long, pos_permille long"
        )
        got = {r["bin"]: r["iso_permille"]
               for r in isotonic_calibration(df).collect()}
        assert got == {0: 100, 1: 500, 2: 900}

    def test_unequal_masses(self, spark):
        from readur_spark.ml.quality_classifier import isotonic_calibration

        # violation with unequal mass: (30·0.9 + 10·0.1)/(40) = 700‰
        rows = [(0, 30, 27, 900), (1, 10, 1, 100)]
        df = spark.createDataFrame(
            rows, "bin long, n_docs long, n_pos long, pos_permille long"
        )
        got = {r["bin"]: r["iso_permille"]
               for r in isotonic_calibration(df).collect()}
        assert got == {0: 700, 1: 700}
