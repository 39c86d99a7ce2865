"""ml/kmeans.py — distributed integer Lloyd's k-means."""

from __future__ import annotations

import math

import pytest

from readur_spark.ml.kmeans import (
    GRID,
    OFFSET,
    int_components,
    kmeans_lloyd,
)


# ---- plain-Python reference (same grid, seeds, tie-break, update) -------


def _py_snap(vecs: dict[int, list[float]]) -> dict[int, list[int]]:
    return {
        vid: [int(math.floor(x * GRID)) + OFFSET for x in v]
        for vid, v in vecs.items()
    }


def _py_lloyd(vecs: dict[int, list[float]], k: int, iters: int):
    comps = _py_snap(vecs)
    cents = {cid: list(comps[cid]) for cid in range(k)}
    assign: dict[int, int] = {}
    for _ in range(iters):
        assign = {}
        for vid, v in comps.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, c)), cid)
                for cid, c in cents.items()
            )
            assign[vid] = best[1]
        new: dict[int, list[int]] = {}
        for cid in set(assign.values()):
            members = [comps[v] for v, c in assign.items() if c == cid]
            new[cid] = [
                sum(col) // len(members) for col in zip(*members)
            ]
        cents = new
    return cents, assign


# two tight groups far apart, plus one in-between point
VECS = {
    0: [0.10, 0.10, 0.10],
    1: [0.50, 0.50, 0.50],
    2: [0.11, 0.09, 0.12],
    3: [0.52, 0.49, 0.51],
    4: [0.09, 0.12, 0.10],
    5: [0.48, 0.52, 0.50],
    6: [0.30, 0.30, 0.30],
}


def _frame(spark):
    rows = [(vid, v) for vid, v in VECS.items()]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestComponents:
    def test_grid_snap_matches_python(self, spark):
        got = {}
        for r in int_components(_frame(spark)).collect():
            got.setdefault(r["vid"], {})[r["pos"]] = r["val"]
        # float32 storage: snap the float32-rounded value, like the engine
        import numpy as np

        for vid, v in VECS.items():
            f32 = [float(np.float32(x)) for x in v]
            want = [int(math.floor(x * GRID)) + OFFSET for x in f32]
            assert [got[vid][p] for p in sorted(got[vid])] == want

    def test_vals_non_negative(self, spark):
        df = spark.createDataFrame(
            [(9, [-1.5, 0.0, 1.99])], "vec_id long, embedding array<float>"
        )
        vals = [r["val"] for r in int_components(df).collect()]
        assert all(v >= 0 for v in vals)
        assert vals == [-1500 + OFFSET, 0 + OFFSET, 1990 + OFFSET]


class TestLloyd:
    @pytest.fixture(scope="class")
    def result(self, spark):
        cents, assign = kmeans_lloyd(int_components(_frame(spark)), 2, 3)
        c = {}
        for r in cents.collect():
            c.setdefault(r["cid"], {})[r["pos"]] = r["cval"]
        a = {r["vid"]: r["cid"] for r in assign.collect()}
        return c, a

    def test_exact_vs_python(self, result, spark):
        import numpy as np

        f32 = {
            vid: [float(np.float32(x)) for x in v] for vid, v in VECS.items()
        }
        py_cents, py_assign = _py_lloyd(f32, 2, 3)
        c, a = result
        assert a == py_assign
        got = {cid: [c[cid][p] for p in sorted(c[cid])] for cid in c}
        assert got == py_cents

    def test_two_groups_separate(self, result):
        _, a = result
        assert a[0] == a[2] == a[4]
        assert a[1] == a[3] == a[5]
        assert a[0] != a[1]

    def test_zero_iters_returns_seeds(self, spark):
        cents, assign = kmeans_lloyd(int_components(_frame(spark)), 2, 0)
        comps = _py_snap(
            {
                vid: [
                    float(__import__("numpy").float32(x)) for x in v
                ]
                for vid, v in VECS.items()
            }
        )
        got = {}
        for r in cents.collect():
            got.setdefault(r["cid"], {})[r["pos"]] = r["cval"]
        for cid in (0, 1):
            assert [got[cid][p] for p in sorted(got[cid])] == comps[cid]
        assert assign.collect() == []


class TestFullCorpusBridge:
    def test_centroids_feed_ivf_assignment(self, spark):
        import numpy as np

        from readur_spark.ml.kmeans import kmeans_centroids_full
        from readur_spark.ml.similarity import with_ivf_cluster
        from readur_spark.queries.tables import load

        vectors = load(spark, "/root/testdata/sf0.001", "embeddings")
        cents = kmeans_centroids_full(vectors, 4, 2)
        assert cents.shape == (4, 64)
        assert np.all(np.abs(cents) < 2.0)  # back on the embedding scale
        assigned = with_ivf_cluster(vectors, cents)
        clusters = {r["cluster"] for r in assigned.select("cluster").distinct().collect()}
        assert clusters <= set(range(4)) and len(clusters) >= 2

    def test_grid_roundtrip_of_centroid_scale(self, spark):
        from readur_spark.ml.kmeans import GRID, OFFSET, kmeans_centroids_full

        df = spark.createDataFrame(
            [(0, [0.5, -0.25]), (1, [0.5, -0.25]), (2, [0.5, -0.25])],
            "vec_id long, embedding array<float>",
        )
        cents = kmeans_centroids_full(df, 1, 1)
        # all identical vectors: centroid == grid snap of the input
        assert cents.tolist() == [
            [(int(0.5 * GRID)) / GRID, (int(-0.25 * GRID)) / GRID]
        ]
