"""Stratified eval-set construction (ml/evalset.py). Oracle-checked by
test_entry_contract.py; these pin the Hamilton exactness, the
quota-bound proportionality, and partitioning-independence of the
content-addressed membership."""

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.evalset import stratified_eval_plan


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    sizes = {"en": 55, "de": 25, "fr": 15, "zh": 5}
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, f"https://h{i}.example/p{i}", lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id BIGINT, url STRING, lang STRING")


def test_total_is_exactly_budget(corpus):
    out = stratified_eval_plan(corpus, budget=20)
    assert out.filter("in_eval").count() == 20


def test_per_stratum_count_equals_quota_and_is_proportional(corpus):
    out = stratified_eval_plan(corpus, budget=20).collect()
    by = {}
    quota = {}
    for r in out:
        quota[r["stratum"]] = r["quota"]
        if r["in_eval"]:
            by[r["stratum"]] = by.get(r["stratum"], 0) + 1
    sizes = {"en": 55, "de": 25, "fr": 15, "zh": 5}
    for s, n in sizes.items():
        assert by.get(s, 0) == quota[s]
        # Hamilton: quota is floor or ceil of the exact share
        exact = 20 * n / 100
        assert quota[s] in (int(exact), int(exact) + 1)


def test_membership_is_partitioning_independent(corpus):
    a = {
        r["doc_id"]
        for r in stratified_eval_plan(corpus, budget=20)
        .filter("in_eval").collect()
    }
    shuffled = corpus.repartition(7).sortWithinPartitions(F.desc("doc_id"))
    b = {
        r["doc_id"]
        for r in stratified_eval_plan(shuffled, budget=20)
        .filter("in_eval").collect()
    }
    assert a == b


def test_eval_slice_leakage_covers_the_whole_slice(spark):
    """The composed certification query audits exactly the eval slice:
    its n_docs equals the number of in_eval members."""
    from readur_spark.ml.evalset import EVAL_BUDGET, eval_set_stratified
    from readur_spark.ml.leakage import _register_eval_slice  # noqa: F401
    from readur_spark.queries.registry import queries

    sf = "/root/testdata/sf0.001"
    n_eval = (
        eval_set_stratified(spark, sf).filter("in_eval").count()
    )
    rows = queries()["eval_slice_leakage"](spark, sf).collect()
    assert len(rows) == 1 and rows[0]["split"] == "eval"
    assert rows[0]["n_docs"] == n_eval == EVAL_BUDGET
    assert 0 <= rows[0]["n_leaked_docs"] <= rows[0]["n_docs"]


def test_budget_larger_than_stratum_is_capped_by_rank(spark):
    """A stratum smaller than its quota ceiling can only contribute
    all its rows — rank <= quota never over-selects."""
    rows = [(i, f"https://x{i}.example/", "en" if i < 3 else "de")
            for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, url STRING, lang STRING")
    out = stratified_eval_plan(df, budget=10).collect()
    assert sum(1 for r in out if r["in_eval"]) == 10  # everything selected
