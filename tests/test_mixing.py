"""ml/mixing.py — data-mixture planning and application."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.mixing import (
    hash_unit,
    plan_mixture,
    with_mixture_epochs,
)
from readur_spark.plans.audit import has_broadcast_join, shuffle_count


class TestPlanMixture:
    def test_down_and_upsample(self):
        plan = plan_mixture(
            {"en": 800, "zh": 100, "es": 100},
            {"en": 0.5, "zh": 0.4, "es": 0.1},
            budget_rows=1000,
        )
        assert plan["en"] == pytest.approx(0.625)  # 500 wanted / 800
        assert plan["zh"] == pytest.approx(4.0)    # 4000/100 capped at 4
        assert plan["es"] == pytest.approx(1.0)

    def test_absent_bucket_excluded(self):
        plan = plan_mixture({"en": 10, "xx": 10}, {"en": 1.0}, 10)
        assert plan["xx"] == 0.0

    def test_zero_count_safe(self):
        assert plan_mixture({"en": 0}, {"en": 1.0}, 10)["en"] == 0.0

    def test_epoch_cap(self):
        plan = plan_mixture({"a": 1}, {"a": 1.0}, 10**6, max_epochs=2.5)
        assert plan["a"] == 2.5


class TestWithMixtureEpochs:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (f"https://h{i % 7}.example/d{i}", "en" if i % 5 else "zh", i)
            for i in range(1000)
        ]
        return spark.createDataFrame(rows, "url string, lang string, v long")

    def test_proportions_near_targets(self, corpus):
        targets = {"en": 0.5, "zh": 0.5}
        out = with_mixture_epochs(corpus, "lang", targets, 1000)
        counts = {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # en: 800 rows at rate 0.625 -> ~500; zh: 200 rows at 2.5 epochs
        # -> ~500. Content-addressed sampling is not exact; 10% slack.
        assert counts["en"] == pytest.approx(500, rel=0.10)
        assert counts["zh"] == pytest.approx(500, rel=0.10)
        # every zh row keeps >= floor(2.5) = 2 full copies
        zh_copies = (
            out.filter(F.col("lang") == "zh").groupBy("url")
            .agg(F.count("*").alias("c"), F.max("epoch").alias("m"))
        )
        bad = zh_copies.filter(
            (F.col("c") < 2) | (F.col("c") > 3) | (F.col("m") != F.col("c"))
        ).count()
        assert bad == 0  # epoch is a contiguous 1..n_copies index

    def test_deterministic_and_content_addressed(self, corpus):
        targets = {"en": 0.3, "zh": 0.7}
        a = sorted(
            with_mixture_epochs(corpus, "lang", targets, 500)
            .select("url", "epoch").collect()
        )
        b = sorted(
            with_mixture_epochs(
                corpus.repartition(13), "lang", targets, 500
            ).select("url", "epoch").collect()
        )
        assert a == b  # survives arbitrary repartitioning

    def test_bucket_without_target_dropped(self, corpus):
        out = with_mixture_epochs(corpus, "lang", {"en": 1.0}, 100)
        assert out.filter(F.col("lang") == "zh").count() == 0

    def test_plan_is_broadcast_and_payload_not_shuffled(self, corpus):
        out = with_mixture_epochs(corpus, "lang", {"en": 0.5, "zh": 0.5}, 1000)
        assert has_broadcast_join(out)
        # the only exchange feeds the K-row count agg, never the corpus:
        # corpus scan -> broadcast join -> explode is exchange-free
        assert shuffle_count(out) <= 2  # partial+final agg of slim counts

    def test_hash_unit_range(self, spark):
        df = spark.range(200).select(
            hash_unit(F.concat(F.lit("k"), F.col("id"))).alias("u")
        )
        row = df.agg(F.min("u"), F.max("u")).collect()[0]
        assert 0.0 <= row[0] and row[1] < 1.0


class TestWithTrainingOrder:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(f"https://h{i % 7}.example/d{i}", i) for i in range(500)]
        return spark.createDataFrame(rows, "url string, v long")

    def test_partition_of_rows(self, corpus):
        from readur_spark.ml.mixing import with_training_order

        out = with_training_order(corpus, "s0", 8)
        assert out.count() == 500  # a shuffle, not a sample
        # pos is a contiguous 1..n index within each shard
        bad = (
            out.groupBy("shard")
            .agg(F.count("*").alias("n"), F.max("pos").alias("m"),
                 F.min("pos").alias("lo"))
            .filter((F.col("m") != F.col("n")) | (F.col("lo") != 1))
            .count()
        )
        assert bad == 0

    def test_seed_changes_order_not_membership(self, corpus):
        from readur_spark.ml.mixing import with_training_order

        a = with_training_order(corpus, "epoch1", 8).select(
            "url", "shard", "pos"
        )
        b = with_training_order(corpus, "epoch2", 8).select(
            "url", "shard", "pos"
        )
        assert sorted(r["url"] for r in a.collect()) == sorted(
            r["url"] for r in b.collect()
        )
        assert sorted(map(tuple, a.collect())) != sorted(
            map(tuple, b.collect())
        )

    def test_deterministic_under_repartition(self, corpus):
        from readur_spark.ml.mixing import with_training_order

        a = sorted(map(tuple, with_training_order(corpus, "s", 4).collect()))
        b = sorted(
            map(
                tuple,
                with_training_order(corpus.repartition(13), "s", 4).collect(),
            )
        )
        assert a == b

    def test_shards_balanced(self, corpus):
        from readur_spark.ml.mixing import with_training_order

        counts = [
            r["n"]
            for r in with_training_order(corpus, "s", 8)
            .groupBy("shard")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        assert len(counts) == 8
        assert max(counts) < 2.0 * min(counts)  # uniform hash, no skew


class TestPlanTokenMixture:
    def _plan(self, spark, rows, targets, budget, cap=4000):
        from readur_spark.ml.mixing import plan_token_mixture

        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = plan_token_mixture(
            df, "lang", targets, budget, max_epochs_milli=cap
        )
        return {r["bucket"]: r.asDict() for r in out.collect()}

    def test_hand_computed_plan(self, spark):
        """en: 6 tokens, target 600‰, budget 10 → epochs_milli =
        min(4000, 6000//6) = 1000, planned = 6.
        de: 2 tokens, target 400‰ → min(4000, 4000//2) = 2000 (2 epochs),
        planned = (2*2000)//1000 = 4."""
        got = self._plan(
            spark,
            [(1, "en", "a b c"), (2, "en", "d e f"), (3, "de", "x y")],
            {"en": 600, "de": 400},
            10,
        )
        assert got["en"]["n_docs"] == 2 and got["en"]["n_tokens"] == 6
        assert got["en"]["epochs_milli"] == 1000
        assert got["en"]["planned_tokens"] == 6
        assert got["de"]["epochs_milli"] == 2000
        assert got["de"]["planned_tokens"] == 4

    def test_cap_and_untargeted_bucket(self, spark):
        """A scarce targeted bucket caps at max epochs; a bucket with
        no target plans zero."""
        got = self._plan(
            spark,
            [(1, "en", "w"), (2, "zz", "v u t")],
            {"en": 1000},
            1000,
            cap=2500,
        )
        assert got["en"]["epochs_milli"] == 2500
        assert got["en"]["planned_tokens"] == 2
        assert got["zz"]["epochs_milli"] == 0
        assert got["zz"]["planned_tokens"] == 0

    def test_single_aggregation_plan(self, spark):
        """The plan is one hash aggregate over a slim projection —
        exactly one exchange, no join, no explode."""
        from readur_spark.ml.mixing import plan_token_mixture

        df = spark.createDataFrame(
            [(1, "en", "a b")], "doc_id long, lang string, text string"
        )
        plan = (
            plan_token_mixture(df, "lang", {"en": 1000}, 100)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Exchange") <= 1, plan
        assert "Generate" not in plan and "Join" not in plan, plan


class TestTemperaturePlan:
    def test_isqrt_exact_at_boundaries(self, spark):
        from readur_spark.ml.mixing import _isqrt
        from pyspark.sql import functions as F

        # perfect squares, their neighbours, and a large near-boundary
        vals = [0, 1, 2, 3, 4, 8, 9, 15, 16, 24, 25,
                10**12, 10**12 + 1, (10**6 + 1) ** 2 - 1, (10**6 + 1) ** 2]
        df = spark.createDataFrame([(v,) for v in vals], "n long")
        got = {r["n"]: r["s"]
               for r in df.select("n", _isqrt(F.col("n")).alias("s")).collect()}
        import math
        for v in vals:
            assert got[v] == math.isqrt(v), v

    def test_sqrt_smoothing_flattens_head(self, spark):
        from readur_spark.ml.mixing import plan_temperature_mixture

        # head bucket has 100x the tokens; sqrt smoothing gives it
        # only ~10x the target share
        rows = [(i, "head", "w " * 100) for i in range(100)]
        rows += [(1000 + i, "tail", "w " * 100) for i in range(1)]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        got = {r["bucket"]: r
               for r in plan_temperature_mixture(df, "lang", 10_000).collect()}
        ratio_raw = got["head"]["n_tokens"] / got["tail"]["n_tokens"]
        ratio_target = got["head"]["target_milli"] / got["tail"]["target_milli"]
        assert ratio_raw == 100.0
        assert 9 <= ratio_target <= 11
        # targets sum to <= 1000 (floor division loses at most K-1 milli)
        assert sum(r["target_milli"] for r in got.values()) <= 1000


class TestAlphaSampling:
    def test_isqrt_exact_around_squares(self, spark):
        from pyspark.sql import functions as F

        from readur_spark.ml.mixing import isqrt_col

        vals = []
        for r in (0, 1, 2, 3, 10, 999, 10**6, 10**9):
            vals += [r * r - 1, r * r, r * r + 1]
        vals = sorted({v for v in vals if v >= 0})
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        out = {
            r["x"]: r["s"]
            for r in df.select("x", isqrt_col(F.col("x")).alias("s")).collect()
        }
        import math

        for v in vals:
            assert out[v] == math.isqrt(v), v

    def test_alpha_plan_flattens_the_head(self, spark):
        from readur_spark.ml.mixing import plan_alpha_mixture

        docs = spark.createDataFrame(
            [(i, "w " * 100, "en") for i in range(90)]
            + [(1000 + i, "w " * 100, "sw") for i in range(10)],
            "doc_id long, text string, lang string",
        )
        rows = {r["lang"]: r for r in plan_alpha_mixture(docs).collect()}
        total = sum(r["token_quota"] for r in rows.values())
        assert total == 1_000_000
        en_raw = rows["en"]["n_tokens"] / (
            rows["en"]["n_tokens"] + rows["sw"]["n_tokens"]
        )
        en_quota = rows["en"]["token_quota"] / total
        # alpha=0.5: 90/10 token split -> 3:1 weight split, not 9:1
        assert en_quota < en_raw
        assert abs(en_quota - 0.75) < 0.01
