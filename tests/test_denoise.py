"""Unit tests for denoising-objective planning — span non-overlap /
bounds invariants, FIM length conservation, and determinism."""

import hashlib

from readur_spark.ml.denoise import (
    MEAN_SPAN,
    MIN_TOKENS,
    fim_split_plan,
    span_corruption_plan,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSpanCorruption:
    def test_bounds_and_non_overlap(self, spark):
        text = " ".join(f"w{i}" for i in range(100))
        df = _docs(spark, [(7, text), (8, " ".join(["x"] * 40))])
        rows = span_corruption_plan(df).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for doc_id, spans in by_doc.items():
            n = spans[0]["n_tokens"]
            s = spans[0]["n_spans"]
            assert len(spans) == s
            # budget: s = max(1, 15% of n / mean span)
            assert s == max(1, (n * 15) // 100 // MEAN_SPAN)
            ivs = sorted(
                (r["start_tok"], r["start_tok"] + r["len_tok"])
                for r in spans
            )
            for (a1, b1), (a2, b2) in zip(ivs, ivs[1:]):
                assert b1 <= a2, f"overlap in doc {doc_id}"
            assert all(0 <= a and b <= n for a, b in ivs)

    def test_short_docs_skipped_and_deterministic(self, spark):
        df = _docs(spark, [(1, "too short"), (2, " ".join(["t"] * MIN_TOKENS))])
        rows1 = sorted(map(tuple, span_corruption_plan(df).collect()))
        rows2 = sorted(map(tuple, span_corruption_plan(df).collect()))
        assert rows1 == rows2
        assert {r[0] for r in rows1} == {2}


class TestFIM:
    def test_length_conservation_and_md5(self, spark):
        text = "0123456789abcdefghij"
        df = _docs(spark, [(3, text)])
        [r] = fim_split_plan(df).collect()
        n = len(text)
        assert r["prefix_len"] + r["middle_len"] + r["suffix_len"] == n
        assert r["middle_len"] >= 1
        assert r["mode"] in ("psm", "spm")
        p, m = r["prefix_len"], r["middle_len"]
        assert r["prefix_md5"] == hashlib.md5(
            text[:p].encode()).hexdigest()
        assert r["middle_md5"] == hashlib.md5(
            text[p:p + m].encode()).hexdigest()
        assert r["suffix_md5"] == hashlib.md5(
            text[p + m:].encode()).hexdigest()

    def test_plan_no_python(self, spark):
        df = _docs(spark, [(1, "0123456789abc")])
        for q in (span_corruption_plan(df), fim_split_plan(df)):
            plan = q._jdf.queryExecution().executedPlan().toString()
            assert "EvalPython" not in plan
