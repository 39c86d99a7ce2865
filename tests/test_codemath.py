"""Code/math content detection (ml/codemath.py).

Full DuckDB value-hash runs in test_entry_contract.py (oracles restate
blocks and scores straight from the construction rules + the
replace-trick counting identity); here: kernel behavior on hand-built
inputs, edge cases the constructed corpus can't reach (empty text,
adjacent display math, unfenced pre), and the zero-Python plan pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from readur_spark.ml.codemath import (
    CODE_SCORE_THRESHOLD_MILLI,
    code_likeness,
    count_occurrences,
    extract_code_blocks,
    math_signals,
)

SF = "/root/testdata/sf0.001"


def _texts(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


class TestCountOccurrences:
    def test_basic_and_empty(self, spark):
        df = _texts(spark, "aXbXXc", "", "XXXX").select(
            count_occurrences(F.col("text"), "X").alias("n")
        )
        assert [r["n"] for r in df.collect()] == [3, 0, 4]

    def test_multichar_nonoverlapping(self, spark):
        # 'aaa' contains 'aa' once non-overlapping (replace semantics)
        df = _texts(spark, "aaa").select(
            count_occurrences(F.col("text"), "aa").alias("n")
        )
        assert df.first()["n"] == 1


class TestCodeLikeness:
    def test_prose_scores_zero(self, spark):
        r = code_likeness(_texts(spark, "the cat sat on the mat")).first()
        assert r["n_code_kw"] == 0 and r["n_code_sym"] == 0
        assert r["code_score_milli"] == 0 and not r["is_code"]

    def test_code_crosses_threshold(self, spark):
        src = "def f(x): return x; import os; void g() { y = 1; }"
        r = code_likeness(_texts(spark, src)).first()
        assert r["n_code_kw"] == 4  # def, return, import, void
        assert r["n_code_sym"] > 0
        assert r["code_score_milli"] >= CODE_SCORE_THRESHOLD_MILLI
        assert r["is_code"]

    def test_empty_text_no_div_zero(self, spark):
        r = code_likeness(_texts(spark, "")).first()
        assert r["code_score_milli"] == 0 and not r["is_code"]


class TestMathSignals:
    def test_inline_display_env_counts(self, spark):
        src = "x $a$ y $$b$$ z \\begin{equation}c\\end{equation} $d$"
        r = math_signals(_texts(spark, src)).first()
        assert r["n_display_eq"] == 1
        assert r["n_inline_eq"] == 2
        assert r["n_latex_envs"] == 1
        assert not r["has_mathml"]
        assert r["math_score_milli"] > 0

    def test_mathml_flag(self, spark):
        r = math_signals(_texts(spark, "<math><mi>x</mi></math>")).first()
        assert r["has_mathml"]
        assert r["n_inline_eq"] == 0 and r["n_display_eq"] == 0

    def test_plain_text_all_zero(self, spark):
        r = math_signals(_texts(spark, "price is 5 dollars")).first()
        assert r["math_score_milli"] == 0 and not r["has_mathml"]


class TestExtractCodeBlocks:
    def _pages(self, spark, html):
        return spark.createDataFrame([("u", html)], ["url", "html_str"])

    def test_two_blocks_in_order(self, spark):
        html = (
            '<pre><code class="language-python">def a(): pass</code></pre>'
            "<p>prose</p>"
            '<pre><code class="language-sql">SELECT 1</code></pre>'
        )
        rows = (
            extract_code_blocks(self._pages(spark, html))
            .orderBy("block_idx")
            .collect()
        )
        assert [(r["block_idx"], r["lang_hint"], r["code"]) for r in rows] == [
            (0, "python", "def a(): pass"),
            (1, "sql", "SELECT 1"),
        ]
        assert rows[0]["n_code_chars"] == len("def a(): pass")

    def test_unfenced_pre_ignored(self, spark):
        html = "<pre>raw block no code class</pre><code>inline</code>"
        assert extract_code_blocks(self._pages(spark, html)).count() == 0

    def test_no_blocks_no_rows(self, spark):
        assert extract_code_blocks(self._pages(spark, "<p>x</p>")).count() == 0


class TestPlans:
    def test_all_three_queries_pure_catalyst(self, spark):
        from readur_spark.plans.audit import shuffle_count
        from readur_spark.queries.registry import queries

        qs = queries()
        for key in (
            "code_block_extract",
            "code_likeness_score",
            "math_content_detect",
        ):
            df = qs[key](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Python" not in plan and "ArrowEval" not in plan, key
            # pure projections over one scan: no shuffle at all
            assert shuffle_count(df) == 0, key
