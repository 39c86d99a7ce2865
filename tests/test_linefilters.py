"""ml/linefilters.py — C4 line gates + corpus-frequency line dedup."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.linefilters import (
    c4_line_filter,
    frequent_line_hashes,
    remove_frequent_lines,
)
from readur_spark.plans.audit import has_no_shuffle


class TestC4LineFilter:
    def test_gate_semantics(self, spark):
        text = "\n".join(
            [
                "This is a proper sentence with enough words.",  # keep
                "Too short.",                                    # < 5 words
                "No terminal punctuation here at all",           # no punct
                "Enable javascript to view this content today.", # javascript
                "function f() { return 1; } is code stuff.",     # brace
                'He said "stop right there, thank you."',        # keep (quote)
                "Another perfectly fine sentence ends here!",    # keep
            ]
        )
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        row = c4_line_filter(df).first()
        kept = row["clean_text"].split("\n")
        assert kept == [
            "This is a proper sentence with enough words.",
            'He said "stop right there, thank you."',
            "Another perfectly fine sentence ends here!",
        ]
        assert row["n_lines"] == 7 and row["n_lines_kept"] == 3

    def test_empty_and_null_safe(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "One good sentence stays right here.")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
        assert rows[1]["clean_text"] == "" and rows[1]["n_lines_kept"] == 0
        assert rows[2]["n_lines_kept"] == 1

    def test_pure_projection_no_shuffle(self, spark):
        df = spark.createDataFrame(
            [(i, "A fine sentence number %d right here." % i) for i in range(50)],
            "doc_id long, text string",
        )
        out = c4_line_filter(df)
        assert has_no_shuffle(out)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestLineDedup:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        boiler = "Subscribe to our newsletter today!"
        rows = []
        for i in range(10):
            body = f"Unique insight number {i} goes here."
            rows.append((i, f"{boiler}\n{body}\n\n{boiler}"))
        rows.append((99, "No boilerplate in this one at all."))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_frequent_set_and_removal(self, corpus):
        freq = frequent_line_hashes(corpus, min_df=5)
        assert len(freq) == 1  # only the boilerplate line crosses df>=5
        out = {r["doc_id"]: r for r in
               remove_frequent_lines(corpus, freq).collect()}
        assert out[0]["clean_text"] == "Unique insight number 0 goes here.\n"
        assert out[0]["n_lines"] == 4 and out[0]["n_lines_kept"] == 2
        assert out[99]["clean_text"] == "No boilerplate in this one at all."

    def test_df_counts_distinct_docs_not_occurrences(self, spark):
        # one doc repeating a line 10 times must NOT make it frequent
        df = spark.createDataFrame(
            [(1, "\n".join(["same line repeated"] * 10)),
             (2, "different content")],
            "doc_id long, text string",
        )
        assert frequent_line_hashes(df, min_df=5) == []

    def test_blank_lines_preserved(self, corpus):
        freq = frequent_line_hashes(corpus, min_df=5)
        row = [r for r in remove_frequent_lines(corpus, freq).collect()
               if r["doc_id"] == 3][0]
        assert "\n" in row["clean_text"]  # the blank separator survived

    def test_removal_is_pure_projection(self, corpus):
        freq = frequent_line_hashes(corpus, min_df=5)
        out = remove_frequent_lines(corpus, freq)
        assert has_no_shuffle(out)

    def test_empty_frequent_set_is_identity(self, corpus):
        out = remove_frequent_lines(corpus, [])
        orig = {r["doc_id"]: r["text"] for r in corpus.collect()}
        for r in out.collect():
            assert r["clean_text"] == orig[r["doc_id"]]


class TestDupLineStats:
    def test_fraction(self, spark):
        from readur_spark.ml.linefilters import with_dup_line_stats

        df = spark.createDataFrame(
            [
                (1, "a\nb\n\na\nc"),   # 4 non-blank, 3 distinct -> 0.25
                (2, "x\nx\nx"),        # 3 non-blank, 1 distinct -> 2/3
                (3, ""),               # no non-blank lines -> 0.0
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in with_dup_line_stats(df).collect()}
        assert got[1]["dup_line_fraction"] == 0.25
        assert got[2]["dup_line_fraction"] == pytest.approx(2 / 3)
        assert got[3]["dup_line_fraction"] == 0.0
        assert got[1]["n_lines_nonblank"] == 4
        assert got[1]["n_lines_distinct"] == 3

    def test_pure_projection(self, spark):
        from readur_spark.ml.linefilters import with_dup_line_stats
        from readur_spark.plans.audit import has_no_shuffle

        df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
        assert has_no_shuffle(with_dup_line_stats(df))
