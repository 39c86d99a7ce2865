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
