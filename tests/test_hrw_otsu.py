"""Unit tests for rendezvous sharding and Otsu threshold selection."""

from pyspark.sql import functions as F

from readur_spark.ml.hrw import rendezvous_assignment
from readur_spark.ml.otsu import otsu_threshold


class TestHRW:
    def test_minimal_movement(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        out = rendezvous_assignment(df, n_shards=8)
        moved = out.filter("moved").count() / 2000
        # exactly the docs whose S+1 draw wins move: E[moved] = 1/9,
        # binomial 3σ ≈ 0.021
        assert abs(moved - 1 / 9) < 0.03
        # balance: each of 8 shards gets ~250 docs
        counts = [r["c"] for r in out.groupBy("shard")
                  .agg(F.count(F.lit(1)).alias("c")).collect()]
        assert len(counts) == 8 and min(counts) > 150

    def test_grow_only_moves_to_new_shard(self, spark):
        # HRW property: a doc that moves when S→S+1 must move TO the
        # new shard (its old argmax is unchanged among shards 0..S-1)
        df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
        out = rendezvous_assignment(df, n_shards=8).filter("moved")
        assert all(r["shard_grow"] == 8 for r in out.collect())

    def test_pure_projection_plan(self, spark):
        df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        plan = (
            rendezvous_assignment(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # no shuffle: per-row argmax only
        assert "EvalPython" not in plan


class TestOtsu:
    def test_bimodal_hand_case(self, spark):
        # 50 docs in bucket 10, 50 in bucket 50 → any cut in [10, 49]
        # separates perfectly; the scaled variance is flat across the
        # plateau so the tie-break picks the SMALLEST such threshold
        rows = [(i, 10) for i in range(50)] + [
            (i + 50, 50) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "doc_id long, b long")
        [r] = otsu_threshold(df, F.col("b")).collect()
        assert r["threshold"] == 10
        assert r["w0"] == 50 and r["n_docs"] == 100
        # var = (s0*n - s*w0)^2 / (w0*(n-w0)) at the cut:
        # s0=500, n=100, s=3000, w0=50 → (50000-150000)^2/2500 = 4e6
        assert r["var_scaled"] == 4_000_000

    def test_shifted_mix(self, spark):
        # 90/10 mix: threshold still lands between the modes
        rows = [(i, 5) for i in range(90)] + [(i + 90, 60) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, b long")
        [r] = otsu_threshold(df, F.col("b")).collect()
        assert 5 <= r["threshold"] < 60


class TestShardBalance:
    def test_hand_computed_gini(self, spark):
        from readur_spark.ml.hrw import shard_balance

        # sizes 1,1,1,1 → gini 0; sizes 0-free skew case 1,3 →
        # num = 1·1 + 3·3 = 10; G = (10 - 2·4)/(2·4) = 0.25
        a = spark.createDataFrame(
            [(i, i % 4) for i in range(8)], "doc_id long, shard int"
        )
        [r] = shard_balance(a).collect()
        assert r["gini_ppm"] == 0 and r["skew_permille"] == 0

        b = spark.createDataFrame(
            [(0, 0), (1, 1), (2, 1), (3, 1)], "doc_id long, shard int"
        )
        [r2] = shard_balance(b).collect()
        assert r2["gini_ppm"] == 250_000
        assert r2["skew_permille"] == 666  # 1000·(3-1)//3

    def test_extreme_concentration(self, spark):
        from readur_spark.ml.hrw import shard_balance

        # all docs on one of two shards → G = (n-1)/n with n=2 → 0.5
        df = spark.createDataFrame(
            [(i, 0) for i in range(10)] + [(99, 1)],
            "doc_id long, shard int",
        )
        [r] = shard_balance(df).collect()
        # sizes 1,10: num = 1 + 30 = 31; G = (31-22)/22 = 0.409…
        assert r["gini_ppm"] == 409_090


class TestConformal:
    def test_order_statistic_and_coverage(self, spark):
        from readur_spark.ml.otsu import conformal_threshold

        # 9 good docs, scores 1..9: q_rank = ceil(10·0.9) = 9 →
        # threshold = lowest score (nonconformity 9th smallest = -1)
        rows = [(i, 1) for i in range(1, 10)] + [(0, 0)]
        df = spark.createDataFrame(rows, "score long, label int")
        [r] = conformal_threshold(df).collect()
        assert r["n_cal"] == 9 and r["q_rank"] == 9
        assert r["threshold_score"] == 1
        assert r["kept_good_permille"] == 1000

    def test_exact_multiple_boundary(self, spark):
        from readur_spark.ml.otsu import conformal_threshold

        # n = 19 → (n+1)·0.9 = 18 exactly: integer ceil-div must give
        # 18, not the float-ceil 19 that 18.000000000000004 produces
        rows = [(i, 1) for i in range(19)]
        df = spark.createDataFrame(rows, "score long, label int")
        [r] = conformal_threshold(df).collect()
        assert r["q_rank"] == 18
