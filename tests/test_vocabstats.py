"""Vocabulary coverage curve (ml/vocabstats.py).

Full DuckDB value-hash runs in test_entry_contract.py; here:
hand-computed coverage, tie-heavy boundary classes, the cap branch,
equivalence with the brute-force ranked definition, and the
zero-Python plan."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from readur_spark.ml.vocabstats import (
    count_of_counts,
    coverage_curve,
    vocab_coverage_curve,
)

SF = "/root/testdata/sf0.001"


def _curve(spark, text: str, cutoffs):
    cc = count_of_counts(spark.createDataFrame([(text,)], ["text"]))
    return {
        r["vocab_size"]: r for r in coverage_curve(cc, cutoffs).collect()
    }


class TestHandComputed:
    def test_distinct_frequencies(self, spark):
        # a:4 b:3 c:2 d:1, T=10
        out = _curve(spark, "a a a a b b b c c d", [1, 2, 3, 8])
        assert out[1]["covered_tokens"] == 4
        assert out[1]["coverage_permille"] == 400
        assert out[2]["covered_tokens"] == 7
        assert out[3]["coverage_permille"] == 900
        # cap branch: only 4 types exist
        assert out[8]["types_used"] == 4
        assert out[8]["covered_tokens"] == 10
        assert out[8]["coverage_permille"] == 1000

    def test_tied_boundary_class(self, spark):
        # a:2 b:2 c:2 d:1 — V=2 falls inside the f=2 class of 3 types
        out = _curve(spark, "a a b b c c d", [2])
        assert out[2]["covered_tokens"] == 4
        assert out[2]["types_used"] == 2

    def test_exact_fit_no_cap(self, spark):
        # V equals the total type count: bounded branch, full coverage
        out = _curve(spark, "a a b", [2])
        assert out[2]["covered_tokens"] == 3
        assert out[2]["coverage_permille"] == 1000


class TestAgainstBruteForce:
    def test_matches_ranked_definition(self, spark):
        """coverage(V) from the count-of-counts shortcut must equal
        the literal 'sum of the top-V ranked types' on the real
        corpus — any rank order breaking ties works, they contribute
        equally."""
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        counts = docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower("text"), "[^a-z]+"),
                    lambda x: x != F.lit(""),
                )
            ).alias("token")
        ).groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        ranked = counts.withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("n").desc(), "token")),
        ).persist()
        curve = {
            r["vocab_size"]: r["covered_tokens"]
            for r in vocab_coverage_curve(spark, SF).collect()
        }
        for v, expected in curve.items():
            brute = ranked.filter(F.col("rnk") <= v).agg(
                F.sum("n")
            ).first()[0]
            assert brute == expected, v
        ranked.unpersist()

    def test_monotone_nondecreasing(self, spark):
        rows = sorted(
            vocab_coverage_curve(spark, SF).collect(),
            key=lambda r: r["vocab_size"],
        )
        cov = [r["coverage_permille"] for r in rows]
        assert cov == sorted(cov)
        assert len(rows) == 7


class TestPlan:
    def test_zero_python(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = (
            coverage_curve(count_of_counts(docs))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
