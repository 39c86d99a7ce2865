"""Sentence-level corpus dedup (ml/sentdedup.py).

The registered query's full DuckDB value-hash runs in
test_entry_contract.py's parametrization; here: the segmentation
kernel's unit behavior (abbreviation guard, punctuation retention,
whitespace forms), the min-words spare rule, and the plan shape
(zero Python; payload never crosses the election shuffle)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from readur_spark.ml.sentdedup import (
    SENT_MIN_WORDS,
    constructed_sentence_pages,
    sentence_dedup,
    split_sentences,
)

SF = "/root/testdata/sf0.001"


def _split(spark, text: str) -> list[str]:
    row = spark.range(1).select(
        split_sentences(F.lit(text)).alias("s")
    ).first()
    return [x for x in row["s"] if x != ""]


class TestSegmentationKernel:
    def test_basic_split_keeps_terminal_punct(self, spark):
        assert _split(spark, "One here. Two there! Three?") == [
            "One here.",
            "Two there!",
            "Three?",
        ]

    def test_abbreviations_do_not_split(self, spark):
        got = _split(spark, "Mr. X met Dr. Y today. Then e.g. left.")
        assert got == ["Mr. X met Dr. Y today.", "Then e.g. left."]

    def test_newline_and_tab_boundaries(self, spark):
        assert _split(spark, "End one.\nStart two.\t Third.") == [
            "End one.",
            "Start two.",
            "Third.",
        ]

    def test_no_trailing_whitespace_no_split(self, spark):
        assert _split(spark, "No boundary.here stays whole.") == [
            "No boundary.here stays whole."
        ]


class TestDedupPolicy:
    @pytest.fixture(scope="class")
    def cleaned(self, spark):
        from readur_spark.queries.tables import load

        docs = constructed_sentence_pages(load(spark, SF, "documents"))
        return sentence_dedup(docs).collect()

    def test_frequent_long_sentences_dropped(self, cleaned):
        assert all("All rights reserved" not in r["clean_text"] for r in cleaned)
        assert all("Subscribe to the newsletter" not in r["clean_text"]
                   for r in cleaned)

    def test_unique_content_kept(self, cleaned):
        assert all("See Dr. Smith about" in r["clean_text"] for r in cleaned)

    def test_short_frequent_sentences_spared(self, cleaned):
        # "Thanks." repeats in half the corpus but has < SENT_MIN_WORDS
        assert SENT_MIN_WORDS > 1
        spared = [r for r in cleaned if r["doc_id"] % 2 == 0]
        assert spared and all(
            r["clean_text"].endswith("Thanks.") for r in spared
        )

    def test_counters_track_drops(self, cleaned):
        assert all(r["n_sents_kept"] < r["n_sents"] for r in cleaned)


class TestPlanShape:
    def test_no_python_and_slim_election(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["sentence_dedup_clean"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        # the election explode projects hashes before any exchange —
        # the raw text column never appears in an aggregate key
        assert "md5" in plan.lower()
