"""IVF ANN: centroid training determinism, probe recall vs brute force."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from readur_spark.ml.similarity import (
    ann_ivf_topk,
    brute_force_topk,
    kmeans_centroids,
    with_ivf_cluster,
)


def _emb(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_kmeans_deterministic():
    rs = np.random.RandomState(0)
    data = rs.normal(size=(500, 16))
    c1 = kmeans_centroids(data, 8, seed=42)
    c2 = kmeans_centroids(data, 8, seed=42)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 16)


def test_cluster_assignment_covers_all(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    sample = np.array([r["embedding"] for r in emb.limit(200).collect()], dtype=np.float64)
    cents = kmeans_centroids(sample, 8)
    clustered = with_ivf_cluster(emb, cents)
    assert clustered.count() == emb.count()
    stats = clustered.agg(F.min("cluster"), F.max("cluster")).first()
    assert 0 <= stats[0] and stats[1] < 8


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    sample = np.array([r["embedding"] for r in emb.limit(256).collect()], dtype=np.float64)
    cents = kmeans_centroids(sample, 8)
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    base = emb.filter("vec_id != 0")

    exact = [r.vec_id for r in brute_force_topk(base, qv, k=10).collect()]
    # probing ALL clusters must reproduce brute force exactly
    full = [
        r.vec_id
        for r in ann_ivf_topk(base, qv, cents, k=10, n_probe=len(cents)).collect()
    ]
    assert full == exact

    # partial probe: meaningful recall with a fraction of the scan
    approx = [r.vec_id for r in ann_ivf_topk(base, qv, cents, k=10, n_probe=3).collect()]
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.5, recall


class TestQuantizedAnn:
    def test_recall_vs_brute_force(self, spark):
        from readur_spark.ml.similarity import ann_quantized_topk, brute_force_topk
        from readur_spark.queries.tables import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        rest = emb.filter(F.col("vec_id") != 0)

        exact = {r["vec_id"] for r in brute_force_topk(rest, query).collect()}
        approx = {r["vec_id"] for r in ann_quantized_topk(rest, query).collect()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, (recall, exact, approx)

    def test_full_rerank_equals_brute_force(self, spark):
        """rerank_factor covering the corpus ⇒ the quantized path must
        return exactly the brute-force answer (candidate stage becomes
        a no-op filter)."""
        from readur_spark.ml.similarity import ann_quantized_topk, brute_force_topk
        from readur_spark.queries.tables import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        rest = emb.filter(F.col("vec_id") != 0)
        exact = [tuple(r) for r in brute_force_topk(rest, query).collect()]
        full = [
            tuple(r)
            for r in ann_quantized_topk(rest, query, rerank_factor=100).collect()
        ]
        assert full == exact

    def test_ivf_quantized_recall(self, spark):
        """Composed IVF→int8→rerank: recall vs brute force bounded by
        the IVF stage (same ≥0.5 bar as the pure-IVF test — the probe
        pruning, not quantization, is what loses neighbors on this
        quasi-random corpus), and with a probe-covering rerank factor
        the composition must equal the pure-IVF answer exactly."""
        import numpy as np

        from readur_spark.ml.similarity import (
            ann_ivf_quantized_topk,
            brute_force_topk,
            kmeans_centroids,
        )
        from readur_spark.queries.tables import load

        emb = load(spark, "/root/testdata/sf0.01", "embeddings")
        sample = np.array(
            [r["embedding"] for r in emb.limit(256).collect()], dtype=np.float64
        )
        cents = kmeans_centroids(sample, n_clusters=8)
        query = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
        rest = emb.filter(F.col("vec_id") != 0)

        exact = {r["vec_id"] for r in brute_force_topk(rest, query).collect()}
        approx = {
            r["vec_id"]
            for r in ann_ivf_quantized_topk(rest, query, cents, n_probe=3).collect()
        }
        assert len(exact & approx) / len(exact) >= 0.5, (exact, approx)

        from readur_spark.ml.similarity import ann_ivf_topk

        ivf_only = [
            tuple(r)
            for r in ann_ivf_topk(rest, query, cents, n_probe=3).collect()
        ]
        composed_full = [
            tuple(r)
            for r in ann_ivf_quantized_topk(
                rest, query, cents, n_probe=3, rerank_factor=100
            ).collect()
        ]
        assert composed_full == ivf_only


class TestQuantizationScaleGuards:
    """ADVICE r2: degenerate inputs must fall back to the identity
    scale instead of raising / poisoning the max with NaN."""

    def test_empty_input_returns_identity(self, spark):
        from readur_spark.ml.similarity import quantization_scale

        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert quantization_scale(empty) == 1.0

    def test_all_zero_vector_does_not_poison(self, spark):
        from pyspark.sql import Row

        from readur_spark.ml.similarity import quantization_scale

        df = spark.createDataFrame(
            [Row(vec_id=0, embedding=[0.0, 0.0]),
             Row(vec_id=1, embedding=[3.0, 4.0])]
        )
        s = quantization_scale(df)
        # normalized (3,4)/5 → max |component| = 0.8; the zero vector
        # contributes 0 (epsilon-guarded norm), not NaN
        assert abs(s - 0.8) < 1e-9


def test_hash_split_adds_only_split_column(spark):
    """ADVICE r2: with_hash_split must not leak its h2 helper column
    into caller schemas (shard writers inherit the projection)."""
    from pyspark.sql import Row

    from readur_spark.ml.webfilters import with_hash_split

    df = spark.createDataFrame([Row(url="u%d" % i) for i in range(10)])
    out = with_hash_split(df, "url")
    assert out.columns == ["url", "split"]
