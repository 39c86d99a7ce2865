"""IVF ANN: centroid training determinism, probe recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
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


class TestIvfIndexMaterialized:
    """Round-3 fix: the registered IVF query path scans a STORED
    cluster-partitioned layout instead of re-assigning the whole corpus
    per query. Pins: result parity with the inline formulation, no
    Python stage at query time, and genuine directory pruning."""

    @pytest.fixture(scope="class")
    def index(self, spark, sf_dir, tmp_path_factory):
        from readur_spark.ml.similarity import (
            build_ivf_index,
            random_hyperplanes,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        cents = random_hyperplanes(64, 8, seed=7)
        root = str(tmp_path_factory.mktemp("ivf_index"))
        return build_ivf_index(emb, cents, root)

    @pytest.fixture(scope="class")
    def query_vec(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        row = emb.filter("vec_id = 0").select("embedding").first()
        return [float(x) for x in row["embedding"]]

    def test_index_path_matches_inline(self, spark, sf_dir, index, query_vec):
        from readur_spark.ml.similarity import (
            ann_ivf_index_topk,
            ann_ivf_topk,
            random_hyperplanes,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        cents = random_hyperplanes(64, 8, seed=7)
        inline = [tuple(r) for r in ann_ivf_topk(emb, query_vec, cents, n_probe=3).collect()]
        stored = [
            tuple(r)
            for r in ann_ivf_index_topk(spark, index, query_vec, n_probe=3).collect()
        ]
        assert stored == inline

    def test_query_plan_has_no_python_stage(self, spark, index, query_vec):
        from readur_spark.ml.similarity import ann_ivf_index_topk

        df = ann_ivf_index_topk(spark, index, query_vec, n_probe=3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan, plan[:800]
        assert "MapInPandas" not in plan

    def test_query_scan_prunes_to_probed_dirs(self, spark, index, query_vec):
        """The cluster predicate must land in the scan's
        PartitionFilters (directory pruning — Iceberg partition pruning
        at scale), and the pruned scan must read exactly the probed
        directories' contents."""
        from readur_spark.ml.similarity import ivf_probe_clusters

        probe = ivf_probe_clusters(index.centroids, query_vec, 3)
        cands = index.read(spark).filter(F.col("cluster").isin(probe))
        plan = cands._jdf.queryExecution().executedPlan().toString()
        pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert pf_lines and any("cluster" in l for l in pf_lines), plan[:800]

        # semantic twin: the filtered scan equals a direct read of only
        # the probed directories
        direct = spark.read.parquet(
            *[f"{index.data_path}/cluster={c}" for c in probe]
        )
        assert cands.count() == direct.count() > 0

    def test_quantized_index_full_probe_huge_rerank_is_exact(
        self, spark, sf_dir, index, query_vec
    ):
        from readur_spark.ml.similarity import (
            ann_ivf_index_quantized_topk,
            brute_force_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        exact = [tuple(r) for r in brute_force_topk(emb, query_vec).collect()]
        stored = [
            tuple(r)
            for r in ann_ivf_index_quantized_topk(
                spark, index, query_vec, n_probe=8, rerank_factor=1000
            ).collect()
        ]
        assert stored == exact

    def test_slim_assignment_matches_with_ivf_cluster(self, spark, sf_dir):
        from readur_spark.ml.similarity import (
            ivf_cluster_ids,
            random_hyperplanes,
            with_ivf_cluster,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        ).limit(200)
        cents = random_hyperplanes(64, 8, seed=7)
        slim = {r["vec_id"]: r["cluster"] for r in ivf_cluster_ids(emb, cents).collect()}
        full = {r["vec_id"]: r["cluster"] for r in with_ivf_cluster(emb, cents).collect()}
        assert slim == full


class TestSlimLshBoundary:
    """Round-3 fix: LSH bucket assignment crosses the Python boundary
    as (id, bucket) only; embeddings attach JVM-side."""

    def test_slim_buckets_match_full(self, spark, sf_dir):
        from readur_spark.ml.similarity import lsh_bucket_ids, with_lsh_bucket

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        ).limit(200)
        slim = {r["vec_id"]: r["bucket"] for r in lsh_bucket_ids(emb, 64, 6, 42).collect()}
        full = {r["vec_id"]: r["bucket"] for r in with_lsh_bucket(emb, 64, 6, 42).collect()}
        assert slim == full

    def test_slim_multi_matches_full(self, spark, sf_dir):
        from readur_spark.ml.similarity import (
            lsh_bucket_ids_multi,
            with_lsh_buckets,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        ).limit(100)
        slim = {
            r["vec_id"]: list(r["buckets"])
            for r in lsh_bucket_ids_multi(emb, 64, 6, 42, 3).collect()
        }
        full = {
            r["vec_id"]: list(r["buckets"])
            for r in with_lsh_buckets(emb, 64, 6, 42, 3).collect()
        }
        assert slim == full

    def test_neardup_python_stage_emits_no_embedding(self, spark, sf_dir):
        """Every MapInPandas node in the near-dup plan outputs only
        (vec_id, bucket) — the payload never crosses outbound."""
        from readur_spark.ml.similarity import embedding_neardup_pairs

        df = embedding_neardup_pairs(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [l for l in plan.splitlines() if "MapInPandas" in l]
        assert lines, "expected a MapInPandas assignment stage"
        for l in lines:
            out = l.rsplit("[", 1)[-1]
            assert "embedding" not in out, l
