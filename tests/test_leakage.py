"""Split-leakage audit (ml/leakage.py). The registered queries are
oracle-checked by test_entry_contract.py; these pin the semantics on
constructed corpora: a planted cross-split duplicate is caught, a
shingle-disjoint corpus reports zero leakage, and the rollup
arithmetic is exact."""

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.leakage import (
    LEAK_SHINGLE_N,
    split_leakage_hits,
    split_leakage_report,
)
from readur_spark.ml.mixing import dataset_split


def _mk(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id BIGINT, url STRING, text STRING"
    )
    return dataset_split(df)


@pytest.fixture(scope="module")
def planted(spark):
    """60 docs with unique texts + one 8-word passage copied into all:
    the hash split necessarily lands copies on both sides."""
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(60):
        filler = " ".join(f"tok{i}word{j}" for j in range(10))
        rows.append((i, f"https://h{i}.example/p", f"{filler} {passage}"))
    return _mk(spark, rows)


def test_planted_duplicate_is_caught(planted):
    splits = {r["split"] for r in planted.select("split").distinct().collect()}
    assert "train" in splits and len(splits) >= 2  # both sides populated
    hits = split_leakage_hits(planted).collect()
    n_eval = planted.filter(F.col("split") != "train").count()
    # every eval doc carries the planted passage -> every one leaks
    assert len(hits) == n_eval > 0
    # the passage has 8 words -> 8 - (n-1) shared shingles, filler is unique
    expected = 8 - (LEAK_SHINGLE_N - 1)
    assert all(r["n_hit_shingles"] == expected for r in hits)


def test_disjoint_corpus_reports_zero(spark):
    rows = [
        (i, f"https://h{i}.example/p",
         " ".join(f"u{i}w{j}" for j in range(12)))
        for i in range(60)
    ]
    df = _mk(spark, rows)
    assert split_leakage_hits(df).count() == 0
    rep = {r["split"]: r for r in split_leakage_report(df).collect()}
    assert all(
        r["n_leaked_docs"] == 0 and r["leaked_permille"] == 0
        and r["sum_hit_shingles"] == 0
        for r in rep.values()
    )


def test_rollup_arithmetic(planted):
    rep = {r["split"]: r for r in split_leakage_report(planted).collect()}
    sizes = {
        r["split"]: r["n"]
        for r in planted.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    for split, r in rep.items():
        assert r["n_docs"] == sizes[split]
        assert r["leaked_permille"] == (1000 * r["n_leaked_docs"]) // r["n_docs"]
        # full leakage in the planted corpus
        assert r["n_leaked_docs"] == r["n_docs"]
        assert r["leaked_permille"] == 1000
