"""Recall verification for the probabilistic dedup/ANN components:
MinHash-LSH vs exact Jaccard, SimHash blocking vs brute-force Hamming,
hyperplane-LSH ANN vs brute-force cosine.

These pin the claims COVERAGE.md makes for dedup_minhash_lsh,
dedup_simhash and ann_lsh_bucketed: each approximate operator is run
against its exact counterpart on data with *known* near-duplicates, so
an implementation bug (wrong permutation arithmetic, broken banding,
sign-flipped projections) shows up as a recall collapse instead of
passing a rows-only smoke check.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from readur_spark.ml.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from readur_spark.ml.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    with_lsh_bucket,
    with_lsh_buckets,
)

# ---- seeded corpus with known near-duplicates ------------------------------


def _near_dup_corpus(n_base: int = 20, n_mut: int = 2, n_random: int = 40,
                     words_per_doc: int = 80, n_replace: int = 4, seed: int = 7):
    """n_base clusters of (1 base + n_mut mutants differing in n_replace
    words → unigram Jaccard ≈ (w-r)/(w+r) ≈ 0.90) plus unrelated random
    docs. Returns [(id, text)]."""
    rs = np.random.RandomState(seed)
    vocab = np.array(["w%04d" % i for i in range(4000)])
    docs = []
    next_id = 0
    for _ in range(n_base):
        base = rs.choice(vocab, size=words_per_doc, replace=False)
        docs.append((next_id, " ".join(base)))
        next_id += 1
        for _ in range(n_mut):
            mut = base.copy()
            idx = rs.choice(words_per_doc, size=n_replace, replace=False)
            mut[idx] = rs.choice(vocab, size=n_replace, replace=False)
            docs.append((next_id, " ".join(mut)))
            next_id += 1
    for _ in range(n_random):
        docs.append((next_id, " ".join(rs.choice(vocab, size=words_per_doc, replace=False))))
        next_id += 1
    return docs


@pytest.fixture(scope="module")
def corpus_df(spark):
    rows = _near_dup_corpus()
    return spark.createDataFrame(
        [(i, t, "x") for i, t in rows], "id long, text string, blk string"
    ).cache()


def test_minhash_lsh_recall_vs_exact_jaccard(spark, corpus_df):
    """64 perms / 16 bands of 4 rows: P[candidate] at s=0.9 is
    1-(1-s^4)^16 ≈ 1-4e-8 — recall vs exact Jaccard≥0.8 must be ≥0.9."""
    truth = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            corpus_df, "id", "text", ["blk"], threshold=0.8
        ).collect()
    }
    assert len(truth) >= 20, "seeded corpus must contain known near-dups"

    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            corpus_df, "id", "text", n_perm=64, n_bands=16, n_shingle=1
        ).collect()
    }
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, (recall, len(truth), len(cand))
    # LSH is a candidate generator, not an oracle — but on a corpus of
    # unrelated 80-word random docs it must not approach all-pairs
    n = corpus_df.count()
    assert len(cand) < 0.05 * n * (n - 1) / 2, len(cand)


def test_minhash_candidates_shrink_with_fewer_bands(spark, corpus_df):
    """Banding math sanity: fewer bands with more rows each (same total
    perms) is strictly more selective."""
    loose = minhash_lsh_pairs(corpus_df, "id", "text", n_perm=64, n_bands=32).count()
    tight = minhash_lsh_pairs(corpus_df, "id", "text", n_perm=64, n_bands=8).count()
    assert tight <= loose


# ---- SimHash vs brute-force Hamming ----------------------------------------


def test_simhash_blocking_exact_at_h3(spark, corpus_df):
    """4 × 16-bit chunk blocking is *complete* for Hamming ≤ 3 (pigeonhole:
    ≤3 differing bits leave ≥1 of 4 chunks intact) — the operator's pair
    set must EQUAL the brute-force XOR-popcount pair set."""
    sigs = simhash_signatures(corpus_df, "id", "text")
    rows = sigs.collect()
    ids = np.array([r.id for r in rows])
    hs = np.array([r.simhash for r in rows]).astype(np.int64).view(np.uint64)

    xor = hs[:, None] ^ hs[None, :]
    ham = np.array([[bin(int(x)).count("1") for x in row] for row in xor])
    iu = np.triu_indices(len(ids), 1)
    truth3 = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])), int(ham[i, j]))
        for i, j in zip(*iu)
        if ham[i, j] <= 3
    }
    got3 = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(sigs, max_hamming=3).collect()
    }
    assert got3 == truth3
    assert len(truth3) >= 5, "corpus must contain simhash near-dups"


def test_simhash_blocking_sound_at_h8(spark, corpus_df):
    """Above the completeness bound (h≤8 with 4 chunks) blocking is a
    heuristic: the blocked set must still be a *subset* of brute force
    with correct distances. Measured recall on this corpus is ~0.68 —
    which is WHY the registered dedup_simhash query stays at
    max_hamming=3, the guaranteed-complete regime (k+1 chunks cover
    Hamming ≤ k); going further needs more chunks or permuted tables."""
    sigs = simhash_signatures(corpus_df, "id", "text")
    rows = sigs.collect()
    ids = np.array([r.id for r in rows])
    hs = np.array([r.simhash for r in rows]).astype(np.int64).view(np.uint64)
    xor = hs[:, None] ^ hs[None, :]
    ham = np.array([[bin(int(x)).count("1") for x in row] for row in xor])
    iu = np.triu_indices(len(ids), 1)
    truth8 = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])), int(ham[i, j]))
        for i, j in zip(*iu)
        if ham[i, j] <= 8
    }
    got8 = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_pairs(sigs, max_hamming=8).collect()
    }
    assert got8 <= truth8
    assert len(truth8) > 0
    assert len(got8) / len(truth8) >= 0.6, (len(got8), len(truth8))


# ---- hyperplane-LSH ANN vs brute force -------------------------------------


def _emb(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    """The synthetic embeddings are near-orthogonal (top-10 cosine only
    ~0.3-0.5 → per-plane agreement ~0.6-0.67), so recall needs the
    multi-table knob turned up: at 4 planes × 8 tables the collision
    model gives P[candidate] ≈ 1-(1-0.62^4)^8 ≈ 0.7 for top-10 sims.
    At web scale one raises planes (selectivity) with tables (recall)
    together; the knob direction is what this pins."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    base = emb.filter("vec_id != 0")

    exact = [r.vec_id for r in brute_force_topk(base, qv, k=10).collect()]
    approx = [
        r.vec_id
        for r in ann_lsh_topk(
            base, qv, dim=len(qv), k=10, n_planes=4, n_tables=8
        ).collect()
    ]
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.5, (recall, approx, exact)


def test_ann_lsh_more_tables_more_candidates(spark, sf_dir):
    """n_tables is the recall knob: the candidate set is a union over
    tables, so it grows monotonically with table count."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    base = emb.filter("vec_id != 0")
    dim = len(qv)

    def n_cands(n_tables):
        q = np.asarray(qv, dtype=np.float64)
        from readur_spark.ml.similarity import random_hyperplanes

        bucketed = with_lsh_buckets(base, dim, 6, 42, n_tables)
        cond = None
        for t in range(n_tables):
            planes = random_hyperplanes(dim, 6, 42 + t)
            qb = int(((q @ planes.T > 0).astype(np.int64) << np.arange(6)).sum())
            c = F.element_at(F.col("buckets"), t + 1) == qb
            cond = c if cond is None else (cond | c)
        return bucketed.filter(cond).count()

    c1, c4 = n_cands(1), n_cands(4)
    assert c4 >= c1
    assert c4 > 0


def test_multi_table_first_table_matches_single(spark, sf_dir):
    """Table 0 of with_lsh_buckets must reproduce with_lsh_bucket at the
    same seed (the single-table operator is the t=0 slice)."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding").limit(100)
    single = {
        r.vec_id: r.bucket for r in with_lsh_bucket(emb, 64, 6, 42).collect()
    }
    multi = {
        r.vec_id: r.buckets[0]
        for r in with_lsh_buckets(emb, 64, 6, 42, 3).collect()
    }
    assert single == multi


def test_minhash_jvm_recall_and_no_python_stage(spark, corpus_df):
    """The all-Catalyst MinHash (seeded-xxhash64 family) must hit the
    same recall bar as the Arrow/blake2b path AND compile without any
    Python/Arrow stage in the physical plan."""
    from readur_spark.ml.dedup import minhash_lsh_pairs_jvm

    truth = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(
            corpus_df, "id", "text", ["blk"], threshold=0.8
        ).collect()
    }
    pairs_df = minhash_lsh_pairs_jvm(
        corpus_df, "id", "text", n_perm=64, n_bands=16, n_shingle=1
    )
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan, plan[:500]

    cand = {(r.id_a, r.id_b) for r in pairs_df.collect()}
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.9, (recall, len(truth), len(cand))
    n = corpus_df.count()
    assert len(cand) < 0.05 * n * (n - 1) / 2, len(cand)


class TestContainmentPairs:
    def test_subset_detected_where_jaccard_misses(self, spark):
        """Doc 2 = a strict prefix of doc 1 (quote/excerpt shape):
        containment from the short side is 1.0 while Jaccard stays
        under a dedup threshold."""
        from readur_spark.ml.dedup import containment_pairs, jaccard_pairs

        long_text = " ".join("w%d" % i for i in range(40))
        short_text = " ".join("w%d" % i for i in range(10))
        docs = spark.createDataFrame(
            [(1, long_text, "en"), (2, short_text, "en")],
            "doc_id long, text string, lang string",
        )
        got = containment_pairs(
            docs, "doc_id", "text", ["lang"], threshold=0.9, n_shingle=3
        ).collect()
        assert len(got) == 1
        r = got[0]
        # 8 shingles in the short doc, all present in the long one
        assert (r["id_a"], r["id_b"]) == (1, 2)
        assert r["contain_b_r"] == 1.0
        assert r["contain_a_r"] < 0.25
        jac = jaccard_pairs(
            docs, "doc_id", "text", ["lang"], threshold=0.8, n_shingle=3
        ).collect()
        assert jac == []

    def test_df_cap_guards_fanout(self, spark):
        """A shingle shared by every doc is dropped by the cap, so no
        pair survives on its evidence alone."""
        from readur_spark.ml.dedup import containment_pairs

        docs = spark.createDataFrame(
            [(i, "common a b unique%d x y" % i, "en") for i in range(6)],
            "doc_id long, text string, lang string",
        )
        got = containment_pairs(
            docs, "doc_id", "text", ["lang"],
            threshold=0.3, df_cap=3, n_shingle=3,
        ).collect()
        assert got == []
