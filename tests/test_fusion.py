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


def test_kendall_hand_computed(spark):
    from readur_spark.queries.fusion import kendall_tau_a

    # s1 ranks 1>2>3, s2 ranks 2>1>3: pairs (1,2) discordant,
    # (1,3) and (2,3) concordant -> tau = (2-1)/3
    df = spark.createDataFrame(
        [(1, 30, 20), (2, 20, 30), (3, 10, 10)],
        "doc_id BIGINT, s1 BIGINT, s2 BIGINT",
    )
    r = kendall_tau_a(df).collect()[0]
    assert (r["n_pairs"], r["concordant"], r["discordant"],
            r["tied_either"]) == (3, 2, 1, 0)
    assert r["tau_a_milli"] == 1000 // 3


def test_kendall_reversal_is_negative_milli(spark):
    from readur_spark.queries.fusion import kendall_tau_a

    df = spark.createDataFrame(
        [(i, i, 10 - i) for i in range(1, 5)],
        "doc_id BIGINT, s1 BIGINT, s2 BIGINT",
    )
    r = kendall_tau_a(df).collect()[0]
    assert r["concordant"] == 0 and r["discordant"] == r["n_pairs"] == 6
    assert r["tau_a_milli"] == -1000


def test_kendall_ties_counted_not_scored(spark):
    from readur_spark.queries.fusion import kendall_tau_a

    df = spark.createDataFrame(
        [(1, 5, 1), (2, 5, 2), (3, 6, 3)],
        "doc_id BIGINT, s1 BIGINT, s2 BIGINT",
    )
    r = kendall_tau_a(df).collect()[0]
    # pair (1,2): s1 tied -> tied_either; (1,3),(2,3) concordant
    assert (r["concordant"], r["discordant"], r["tied_either"]) == (2, 0, 1)
