"""Banned-term blocklist gate (ml/blocklist.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: matching
semantics (word boundaries, phrase adjacency, case folding, multiset
counting, the zip_with null-padding edge), gate behavior on clean
docs, and the broadcast-join plan."""

from __future__ import annotations

import pytest

from readur_spark.ml.blocklist import banned_term_hits, blocklist_gate

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def terms(spark):
    return spark.createDataFrame(
        [("bad",), ("two words",)], "term string"
    )


def _hits(spark, terms, text: str) -> int:
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return banned_term_hits(df, terms).first()["n_banned_hits"]


class TestMatching:
    def test_word_boundary_not_substring(self, spark, terms):
        assert _hits(spark, terms, "badge badly embad") == 0

    def test_unigram_multiset_count(self, spark, terms):
        assert _hits(spark, terms, "bad things bad") == 2

    def test_phrase_needs_adjacency(self, spark, terms):
        assert _hits(spark, terms, "two words here") == 1
        assert _hits(spark, terms, "two other words") == 0

    def test_case_folded(self, spark, terms):
        assert _hits(spark, terms, "BAD Two WORDS") == 2

    def test_trailing_banned_token_counts_once(self, spark, terms):
        # the zip_with null-padding edge: last token must not double
        # as a phantom bigram
        assert _hits(spark, terms, "this ends bad") == 1

    def test_single_token_doc(self, spark, terms):
        assert _hits(spark, terms, "bad") == 1
        assert _hits(spark, terms, "fine") == 0


class TestGate:
    def test_clean_docs_kept_with_zero_hits(self, spark, terms):
        df = spark.createDataFrame(
            [(1, "all clean here"), (2, "bad row")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: (r["n_banned_hits"], r["keep"])
               for r in blocklist_gate(df, terms).collect()}
        assert got == {1: (0, 1), 2: (1, 0)}


class TestPlanShape:
    def test_broadcast_join_no_python(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["qc_blocklist_gate"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        assert "BroadcastHashJoin" in plan
