"""SemDeDup semantics (ml/semdedup.py): cluster-blocked pairing,
duplicate components, and the lowest-centroid-similarity keep rule."""

from __future__ import annotations

import numpy as np
import pytest

from readur_spark.ml.semdedup import semantic_dedup


@pytest.fixture(scope="module")
def result(spark):
    # two orthogonal centroids; vectors hand-placed so cluster 0 holds
    # a 3-clique of near-dups + one far singleton, cluster 1 holds two
    # vectors below the pair threshold
    centroids = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    rows = [
        # cluster 0 near-dup clique (pairwise cosine ~1): ids 1,2,3
        (1, [1.0, 0.02, 0.0]),
        (2, [1.0, 0.03, 0.0]),
        (3, [1.0, 0.04, 0.0]),
        # cluster 0 but far from the clique AND from the centroid
        (4, [0.5, 0.0, 0.86]),
        # cluster 1, mutually dissimilar
        (5, [0.1, 1.0, 0.0]),
        (6, [0.0, 1.0, 0.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, centroids, eps=0.9)
    return {r["vec_id"]: r.asDict() for r in out.collect()}


def test_cluster_assignment(result):
    assert [result[i]["cluster"] for i in (1, 2, 3, 4)] == [0, 0, 0, 0]
    assert [result[i]["cluster"] for i in (5, 6)] == [1, 1]


def test_components(result):
    # the clique collapses to comp=min id; everyone else is a singleton
    assert [result[i]["comp"] for i in (1, 2, 3)] == [1, 1, 1]
    for i in (4, 5, 6):
        assert result[i]["comp"] == i


def test_keep_rule_lowest_centroid_sim(result):
    # within the clique, id 3 has the largest angle to centroid 0
    # (csim decreasing in the second coordinate? no — increasing off-axis
    # lowers cosine, so id 3 with 0.04 off-axis is least similar)
    clique = {i: result[i]["csim"] for i in (1, 2, 3)}
    keeper = min(clique, key=lambda i: (clique[i], i))
    assert keeper == 3
    assert [result[i]["keep"] for i in (1, 2, 3)] == [False, False, True]
    # singletons always keep
    for i in (4, 5, 6):
        assert result[i]["keep"] is True


def test_one_keeper_per_component(result):
    comps = {}
    for r in result.values():
        comps.setdefault(r["comp"], []).append(r["keep"])
    for comp, keeps in comps.items():
        assert sum(keeps) == 1, (comp, keeps)


def test_dedup_rate_bounded(result):
    # SemDeDup never drops a whole cluster: kept count == n_components
    n_comp = len({r["comp"] for r in result.values()})
    n_keep = sum(r["keep"] for r in result.values())
    assert n_keep == n_comp == 4
