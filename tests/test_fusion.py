"""Reciprocal-rank fusion (queries/fusion.py). The registered query is
oracle-checked by test_entry_contract.py; these pin the formula and
the fusion semantics on hand-computed lists."""

from readur_spark.queries.fusion import RRF_K, RRF_SCALE, ranked, rrf_fuse


def _lists(spark):
    a = spark.createDataFrame(
        [(1, 100), (2, 90), (3, 80)], "doc_id BIGINT, s BIGINT"
    )
    b = spark.createDataFrame(
        [(2, 7), (4, 5)], "doc_id BIGINT, s BIGINT"
    )
    return ranked(a, "s"), ranked(b, "s")


def test_hand_computed_scores(spark):
    ra, rb = _lists(spark)
    out = {r["doc_id"]: (r["rrf_score"], r["n_lists"])
           for r in rrf_fuse([ra, rb]).collect()}
    c = lambda r: RRF_SCALE // (RRF_K + r)
    assert out[1] == (c(1), 1)
    assert out[2] == (c(2) + c(1), 2)  # rank 2 in a, rank 1 in b
    assert out[3] == (c(3), 1)
    assert out[4] == (c(2), 1)


def test_agreement_beats_single_list(spark):
    """A doc found by both rankers outscores a doc ranked equally high
    by only one — the property RRF is chosen for."""
    ra, rb = _lists(spark)
    out = {r["doc_id"]: r["rrf_score"] for r in rrf_fuse([ra, rb]).collect()}
    assert out[2] > out[1]


def test_rank_tiebreak_is_deterministic(spark):
    tied = spark.createDataFrame(
        [(10, 5), (11, 5), (12, 5)], "doc_id BIGINT, s BIGINT"
    )
    ranks = {r["doc_id"]: r["rank"] for r in ranked(tied, "s").collect()}
    assert ranks == {10: 1, 11: 2, 12: 3}  # doc_id ascending on ties
