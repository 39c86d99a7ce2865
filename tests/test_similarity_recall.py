"""Recall-observable tests: the lsh_recall_table machinery on data
with real cluster structure (where LSH must shine)."""

import math

from readur_spark.ml.similarity import lsh_recall_table


class TestLshRecallTable:
    def test_clustered_data_high_recall(self, spark):
        # anchor 0 plus 10 tight cluster-mates (tiny angular jitter)
        # and 200 far-away noise vectors in the opposite half-space:
        # every true neighbor shares the anchor's buckets → recall 1000
        rows = []
        dim = 8
        base = [1.0] + [0.0] * (dim - 1)
        rows.append((0, base))
        for i in range(1, 11):
            v = list(base)
            v[1] = 0.001 * i  # ~0.06° of jitter
            rows.append((i * 100 if i <= 4 else 1000 + i, v))
        for j in range(200):
            v = [-1.0] + [math.sin(j + d) * 0.01 for d in range(dim - 1)]
            rows.append((2000 + j, v))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        out = {r["anchor_id"]: r
               for r in lsh_recall_table(df, dim=dim).collect()}
        a0 = out[0]
        assert a0["n_brute"] == 10
        assert a0["recall_permille"] == 1000

    def test_counts_consistent(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        rows = [(i, [float(x) for x in rng.normal(size=8)])
                for i in range(150)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        for r in lsh_recall_table(df, dim=8).collect():
            assert 0 <= r["hits"] <= min(r["n_brute"], r["n_lsh"])
            assert r["recall_permille"] == 1000 * r["hits"] // r["n_brute"]
