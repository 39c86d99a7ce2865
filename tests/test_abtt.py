"""All-but-the-top embedding post-processing (ml/abtt.py).

The registered queries are value-hash-checked against their DuckDB
twins by test_entry_contract.py; these tests pin the properties the
oracle replay alone cannot see: the Arrow partial-matmul Gram equals
the pure-Catalyst Gram bit-for-bit, the power iteration recovers a
planted dominant direction, the residual is orthogonal to the
recovered direction up to the documented truncation bound, and the
sign-abs division idiom agrees with DuckDB's flooring `//` on
negative operands.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from readur_spark.ml.abtt import (
    ABTT_ITERS,
    GRID,
    PC_SCALE,
    abtt_project,
    centered_vectors,
    gram_matrix,
    gram_matrix_catalyst,
    mean_vector,
    power_iteration,
    quantized_components,
    top_direction,
)


def _planted(spark, n=200, d=16, seed=7):
    """Vectors = strong direction w scaled per-row + small md5-derived
    noise: PC1 after mean removal is w up to sign/scale."""
    rows = []
    import hashlib

    w = [((i * 37 + 11) % 13 - 6) / 6.0 for i in range(d)]
    for i in range(n):
        a = ((i * 97 + seed) % 41 - 20) / 4.0  # loading, mean ~0
        vec = []
        for j in range(d):
            h = hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
            noise = (h[0] - 127.5) / 2000.0
            vec.append(a * w[j] + noise)
        rows.append((i, vec))
    return (
        spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>"),
        w,
    )


@pytest.fixture(scope="module")
def planted(spark):
    return _planted(spark)


class TestGram:
    def test_arrow_equals_catalyst(self, planted):
        vectors, _ = planted
        n = vectors.count()
        d = len(vectors.first()["embedding"])
        comps = quantized_components(vectors)
        mu = mean_vector(comps, n)
        a = {
            (r["j"], r["k"]): r["g"]
            for r in gram_matrix(centered_vectors(vectors, mu), d).collect()
        }
        b = {
            (r["j"], r["k"]): r["g"]
            for r in gram_matrix_catalyst(comps, mu).collect()
        }
        assert a == b
        # symmetric by construction
        assert all(a[(j, k)] == a[(k, j)] for (j, k) in a)

    def test_mean_removal_sums_near_zero(self, planted):
        """After subtracting mu_j = sdiv(sum, n), each dimension's
        centered sum is the division remainder: |sum c_ij| < n."""
        vectors, _ = planted
        n = vectors.count()
        comps = quantized_components(vectors)
        mu = mean_vector(comps, n)
        sums = (
            centered_vectors(vectors, mu)
            .select(F.posexplode("c").alias("p", "c"))
            .groupBy("p")
            .agg(F.sum("c").alias("s"))
            .collect()
        )
        assert all(abs(r["s"]) < n for r in sums)


class TestPowerIteration:
    def test_recovers_planted_direction(self, planted):
        vectors, w = planted
        _, v, _ = top_direction(vectors, iters=ABTT_ITERS)
        # cosine between recovered v and planted w, up to sign
        num = sum(x * y for x, y in zip(v, w))
        den = (sum(x * x for x in v) ** 0.5) * (sum(y * y for y in w) ** 0.5)
        assert abs(num) / den > 0.99

    def test_scale_bound(self, planted):
        vectors, _ = planted
        _, v, _ = top_direction(vectors)
        assert max(abs(x) for x in v) == PC_SCALE  # max-abs normalized
        assert all(abs(x) <= PC_SCALE for x in v)

    def test_zero_gram_guard(self):
        # all-identical vectors -> centered to remainders only; the
        # gmax/umax greatest(...,1) guards must keep it total
        v = power_iteration([], d=4, iters=3)
        assert len(v) == 4

    def test_exactness_vs_numpy_free_reference(self):
        """Hand-replay 2 iterations on a tiny Gram."""
        gram = [(1, 1, 8), (1, 2, -4), (2, 1, -4), (2, 2, 2)]
        v = power_iteration(gram, d=2, iters=1)
        # gmax=8; gn = [[2^20, -2^19],[-2^19, 2^18]]; v0=[1024,1024]
        g11, g12, g22 = 1 << 20, -(1 << 19), 1 << 18
        u = [g11 * 1024 + g12 * 1024, g12 * 1024 + g22 * 1024]
        umax = max(abs(x) for x in u)
        exp = [
            (x * PC_SCALE) // umax if x >= 0 else -((-x * PC_SCALE) // umax)
            for x in u
        ]
        assert v == exp


class TestProjection:
    def test_residual_orthogonal_within_truncation(self, planted):
        """|r . v| <= sum_j |v_j| — each per-component sdiv truncation
        contributes < |v_j| to the residual loading."""
        vectors, _ = planted
        d = len(vectors.first()["embedding"])
        mu, v, _ = top_direction(vectors)
        bound = sum(abs(x) for x in v)
        cent = centered_vectors(vectors, mu)
        vv = sum(x * x for x in v) or 1
        v_sql = "array(" + ",".join(f"{x}L" for x in v) + ")"
        load = (
            f"aggregate(zip_with(c, {v_sql}, (x, y) -> x * y),"
            " CAST(0 AS BIGINT), (a, x) -> a + x)"
        )
        resid_dot = cent.select(
            F.expr(load).alias("load"), "c"
        ).select(
            F.expr(
                f"aggregate(zip_with(c, {v_sql}, (x, y) -> "
                "(x - (CASE WHEN load * y >= 0 THEN (load * y) div "
                f"{vv} ELSE -((-(load * y)) div {vv}) END)) * y), "
                "CAST(0 AS BIGINT), (a, x) -> a + x)"
            ).alias("rv")
        ).collect()
        assert all(abs(r["rv"]) <= bound for r in resid_dot)

    def test_projection_shrinks_planted_corpus(self, planted):
        """On a corpus dominated by one direction, removing PC1 must
        shrink (almost) every vector's norm."""
        vectors, _ = planted
        mu, v, _ = top_direction(vectors)
        out = abtt_project(vectors, mu, v).collect()
        assert len(out) == vectors.count()
        shrunk = sum(1 for r in out if r["norm2_after"] <= r["norm2_before"])
        assert shrunk == len(out)
        # and the shrinkage is material, not epsilon: median ratio < 1/2
        ratios = sorted(
            r["norm2_after"] / max(r["norm2_before"], 1) for r in out
        )
        assert ratios[len(ratios) // 2] < 0.5

    def test_plan_is_python_free(self, planted):
        """The projection is HOF codegen — no BatchEvalPython /
        ArrowEvalPython / mapInPandas stage in the plan."""
        vectors, _ = planted
        mu, v, _ = top_direction(vectors)
        plan = abtt_project(vectors, mu, v)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan and "MapInPandas" not in plan


class TestDenoisedMips:
    def test_residual_vectors_match_python_recompute(self, planted):
        vectors, _ = planted
        mu, v, _ = top_direction(vectors)
        from readur_spark.ml.abtt import residual_vectors

        vv = sum(x * x for x in v) or 1

        def sdiv(a, b):
            return a // b if a >= 0 else -((-a) // b)

        got = {r["vid"]: list(r["r"])
               for r in residual_vectors(vectors, mu, v).collect()}
        import math

        for row in vectors.collect():
            c = [
                math.floor(float(e) * GRID) - m
                for e, m in zip(row["embedding"], mu)
            ]
            load = sum(x * y for x, y in zip(c, v))
            exp = [x - sdiv(load * y, vv) for x, y in zip(c, v)]
            assert got[row["vec_id"]] == exp

    def test_denoising_changes_the_ranking(self, planted):
        """On the planted corpus the raw dot ranking is dominated by
        the common direction; after removal the ranking must differ —
        the reason the hygiene pass exists."""
        vectors, _ = planted
        mu, v, _ = top_direction(vectors)
        from readur_spark.ml.abtt import residual_vectors

        cent = centered_vectors(vectors, mu)
        resid = residual_vectors(vectors, mu, v)

        def topk(df, col):
            rows = df.collect()
            q = next(list(r[col]) for r in rows if r["vid"] == 0)
            scored = [
                (sum(a * b for a, b in zip(r[col], q)), r["vid"])
                for r in rows
                if r["vid"] != 0
            ]
            return [vid for _, vid in sorted(scored, key=lambda t: (-t[0], t[1]))[:10]]

        raw = topk(cent.select("vid", F.col("c").alias("x")), "x")
        den = topk(resid.select("vid", F.col("r").alias("x")), "x")
        assert raw != den


class TestSdivCrossEngine:
    def test_sdiv_matches_duckdb_on_negatives(self):
        """The whole module leans on sign-abs division; pin the idiom
        itself against DuckDB for a grid of negative/positive pairs."""
        con = duckdb.connect()
        cases = [(a, b) for a in (-17, -5, -1, 0, 1, 5, 17) for b in (3, 7)]
        for a, b in cases:
            py = a // b if a >= 0 else -((-a) // b)
            duck = con.execute(
                f"SELECT CASE WHEN {a} >= 0 THEN {a} // {b}"
                f" ELSE -((-({a})) // {b}) END"
            ).fetchone()[0]
            assert py == duck, (a, b)

    def test_quantization_grid_matches_kmeans_family(self):
        assert GRID == 16384  # oracle literal — keep in lockstep
