"""Clustering evaluation (ml/clustereval.py). The registered queries
are oracle-checked by test_entry_contract.py (random labels — ARI near
0); these pin the formula's fixed points the fixture can't reach:
perfect agreement = 1000, a hand-computed negative (worse-than-chance)
case through the sign-abs arm, purity arithmetic, and invariance under
cluster relabeling."""

import pytest

from readur_spark.ml.clustereval import ari_milli, cluster_purity, contingency


def _ct(spark, triples):
    """triples: (vid, cid, label) rows."""
    a = spark.createDataFrame(
        [(v, c) for v, c, _ in triples], "vid BIGINT, cid BIGINT"
    )
    l = spark.createDataFrame(
        [(v, y) for v, _, y in triples], "vid BIGINT, label BIGINT"
    )
    return contingency(a, l)


def _ref_ari_milli(triples):
    """Independent float reference, truncated to milli like sdiv."""
    from collections import Counter

    nij = Counter((c, y) for _, c, y in triples)
    ai = Counter(c for _, c, _ in triples)
    bj = Counter(y for _, _, y in triples)
    P = lambda x: x * (x - 1) // 2
    snij = sum(P(v) for v in nij.values())
    sa = sum(P(v) for v in ai.values())
    sb = sum(P(v) for v in bj.values())
    c2n = P(len(triples))
    num = 2 * (c2n * snij - sa * sb)
    den = c2n * (sa + sb) - 2 * sa * sb
    if den == 0:
        return 0
    a = 1000 * num
    return a // den if a >= 0 else -((-a) // den)


def test_perfect_agreement_is_1000(spark):
    triples = [(i, i % 3, i % 3) for i in range(30)]
    row = ari_milli(_ct(spark, triples)).collect()[0]
    assert row["ari_milli"] == 1000


def test_negative_ari_through_sign_abs_arm(spark):
    """Two balanced labels, clusters split each label exactly in half
    across clusters of unequal sizes -> hand-checkable sub-chance
    assignment; pin against the independent reference."""
    triples = []
    vid = 0
    # cluster 0: 3 of label 0 + 1 of label 1; cluster 1: 1 + 3
    for c, counts in ((0, (3, 1)), (1, (1, 3)), (2, (2, 2))):
        for label, n in enumerate(counts):
            for _ in range(n):
                triples.append((vid, c, label))
                vid += 1
    want = _ref_ari_milli(triples)
    got = ari_milli(_ct(spark, triples)).collect()[0]["ari_milli"]
    assert got == want
    # and force a genuinely negative configuration
    neg = [(0, 0, 0), (1, 0, 1), (2, 1, 0), (3, 1, 1)]
    assert _ref_ari_milli(neg) < 0
    assert ari_milli(_ct(spark, neg)).collect()[0]["ari_milli"] == _ref_ari_milli(neg)


def test_relabeling_clusters_is_invariant(spark):
    triples = [(i, i % 4, (i * 7) % 3) for i in range(40)]
    renamed = [(v, (c + 2) % 4, y) for v, c, y in triples]
    a = ari_milli(_ct(spark, triples)).collect()[0]["ari_milli"]
    b = ari_milli(_ct(spark, renamed)).collect()[0]["ari_milli"]
    assert a == b == _ref_ari_milli(triples)


def test_degenerate_single_cluster_single_label_is_zero(spark):
    triples = [(i, 0, 0) for i in range(5)]
    assert ari_milli(_ct(spark, triples)).collect()[0]["ari_milli"] == 0


def test_label_noise_planted_mislabel_is_flagged(spark):
    """Clean clusters with one planted wrong label -> exactly that
    vector disagrees with its cluster majority."""
    from readur_spark.ml.clustereval import label_disagreement

    triples = [(i, i % 3, i % 3) for i in range(30)]
    triples[7] = (7, 7 % 3, (7 % 3 + 1) % 3)  # vid 7 mislabeled
    a = spark.createDataFrame(
        [(v, c) for v, c, _ in triples], "vid BIGINT, cid BIGINT"
    )
    l = spark.createDataFrame(
        [(v, y) for v, _, y in triples], "vid BIGINT, label BIGINT"
    )
    out = {r["vid"]: r for r in label_disagreement(a, l).collect()}
    assert len(out) == 30
    flagged = [v for v, r in out.items() if r["disagrees"]]
    assert flagged == [7]
    assert out[7]["majority_label"] == 7 % 3


def test_purity_majority_and_tiebreak(spark):
    triples = (
        [(i, 0, 0) for i in range(6)] + [(10 + i, 0, 1) for i in range(2)]
        # cluster 1: exact tie between labels 3 and 5 -> smaller wins
        + [(20 + i, 1, 3) for i in range(2)]
        + [(30 + i, 1, 5) for i in range(2)]
    )
    out = {r["cid"]: r for r in cluster_purity(_ct(spark, triples)).collect()}
    assert out[0]["size"] == 8 and out[0]["majority_label"] == 0
    assert out[0]["purity_milli"] == (1000 * 6) // 8
    assert out[1]["majority_label"] == 3  # tie -> min label
    assert out[1]["purity_milli"] == 500
