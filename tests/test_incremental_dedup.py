"""Incremental near-dup: delta probed against a stored band table."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.dedup import (
    incremental_neardup_new_ids,
    minhash_band_table_jvm,
    minhash_lsh_pairs_jvm,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sailors navigate the harbor under a crimson evening sky carrying "
    "heavy crates of oranges toward the waiting market stalls "
)


@pytest.fixture(scope="module")
def corpora(spark):
    existing_rows = [(i, BASE + f"tail variant {i} alpha beta") for i in range(10)]
    # new: 5 near-copies of existing docs, 5 genuinely novel docs
    near = [(100 + i, BASE + f"tail variant {i} alpha gamma") for i in range(5)]
    novel = [
        (
            200 + i,
            " ".join(f"novel{i}w{j}" for j in range(60)),
        )
        for i in range(5)
    ]
    existing = spark.createDataFrame(existing_rows, "doc_id long, text string")
    new = spark.createDataFrame(near + novel, "doc_id long, text string")
    return existing, new


class TestIncrementalNeardup:
    def test_near_copies_flagged_novel_pass(self, corpora):
        existing, new = corpora
        bands = minhash_band_table_jvm(existing, "doc_id", "text")
        got = {
            r["id"]
            for r in incremental_neardup_new_ids(
                new, bands, "doc_id", "text"
            ).collect()
        }
        assert {100, 101, 102, 103, 104} <= got
        assert not any(i >= 200 for i in got)

    def test_equivalent_to_full_corpus_pairs(self, corpora):
        """The incremental probe must flag exactly the new ids that the
        full-corpus pair formulation links to an existing id."""
        existing, new = corpora
        full = minhash_lsh_pairs_jvm(
            existing.unionByName(new), "doc_id", "text"
        ).collect()
        expected = set()
        for r in full:
            a, b = r["id_a"], r["id_b"]
            if (a < 100) != (b < 100):  # one side existing, one side new
                expected.add(a if a >= 100 else b)
        bands = minhash_band_table_jvm(existing, "doc_id", "text")
        got = {
            r["id"]
            for r in incremental_neardup_new_ids(
                new, bands, "doc_id", "text"
            ).collect()
        }
        assert got == expected

    def test_probe_is_jvm_only(self, corpora):
        existing, new = corpora
        bands = minhash_band_table_jvm(existing, "doc_id", "text")
        out = incremental_neardup_new_ids(new, bands, "doc_id", "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan

    def test_registered_summary(self, spark):
        import __spark_entry__ as e

        row = e.queries()["incremental_neardup_plan"](
            spark, "/root/testdata/sf0.001"
        ).first()
        assert row["n_new"] > 0
        assert 0 <= row["n_exact_dup"] <= row["n_new"]
        assert 0 <= row["n_near_candidates"] <= row["n_new"]
