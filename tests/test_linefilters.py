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


class TestLineDedupJoinPath:
    """VERDICT r4 'What's wrong #1': above MAX_LITERAL_HASHES the
    frequent set must stay distributed — removal via hash join, never
    a multi-MB plan literal."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        boiler = "Subscribe to our newsletter today!"
        footer = "Copyright 2024 Example Corp."
        rows = []
        for i in range(10):
            body = f"Unique insight number {i} goes here."
            rows.append((i, f"{boiler}\n{body}\n\n{footer}"))
        rows.append((99, "No boilerplate in this one at all."))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_join_path_matches_literal_path(self, corpus):
        from readur_spark.ml.linefilters import (
            frequent_line_hash_frame,
            remove_frequent_lines_join,
        )

        hashes = frequent_line_hashes(corpus, min_df=5)
        freq = frequent_line_hash_frame(corpus, min_df=5)
        lit_out = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_kept"])
            for r in remove_frequent_lines(corpus, hashes).collect()
        }
        join_out = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_lines_kept"])
            for r in remove_frequent_lines_join(corpus, freq).collect()
        }
        assert join_out == lit_out  # byte-identical, counts included

    def test_dispatch_picks_join_above_threshold(self, corpus):
        from readur_spark.ml.linefilters import line_dedup

        # force the large-set branch: any frequent set > 0 exceeds 0
        out = line_dedup(corpus, max_literal=0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "posexplode" in plan.lower() or "Generate" in plan
        # the frequent hashes must NOT be inlined as a literal array
        boiler_h = frequent_line_hashes(corpus, min_df=5)[0]
        optimized = out._jdf.queryExecution().optimizedPlan().toString()
        assert boiler_h not in optimized
        # and it still removes the boilerplate byte-identically
        got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
        assert got[0] == "Unique insight number 0 goes here.\n"
        assert got[99] == "No boilerplate in this one at all."

    def test_dispatch_keeps_literal_for_small_sets(self, corpus):
        from readur_spark.ml.linefilters import line_dedup

        out = line_dedup(corpus, max_literal=10_000)
        # literal path = pure projection, no join, no regroup shuffle
        assert has_no_shuffle(out)


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
