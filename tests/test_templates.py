"""DOM structural fingerprinting (ml/templates.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
fingerprint kernel's invariances (content-independence, attribute/
comment/closer blindness, case folding), rollup semantics, and the
zero-Python plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.templates import (
    structure_signature,
    template_rollup,
    with_structure_sig,
)

SF = "/root/testdata/sf0.001"


def _sig(spark, html: str) -> str:
    return spark.range(1).select(
        structure_signature(F.lit(html)).alias("s")
    ).first()["s"]


class TestFingerprintKernel:
    def test_content_independent(self, spark):
        a = _sig(spark, "<html><body><p>alpha text</p></body></html>")
        b = _sig(spark, "<html><body><p>totally different</p></body></html>")
        assert a == b

    def test_attributes_comments_closers_ignored(self, spark):
        plain = _sig(spark, "<div><p>x</p></div>")
        noisy = _sig(
            spark,
            '<div class="wide" id=main><!-- note --><p style="a">y</p></div>',
        )
        assert plain == noisy

    def test_structure_sensitive(self, spark):
        assert _sig(spark, "<div><p>x</p></div>") != _sig(
            spark, "<div><span>x</span></div>"
        )

    def test_case_folded(self, spark):
        assert _sig(spark, "<DIV><P>x</P></DIV>") == _sig(
            spark, "<div><p>x</p></div>"
        )


class TestRollup:
    def test_census_counts(self, spark):
        pages = spark.createDataFrame(
            [("h1", "s1"), ("h1", "s1"), ("h1", "s2"), ("h2", "s3")],
            "host string, structure_sig string",
        )
        got = {
            r["host"]: (r["n_pages"], r["n_templates"], r["top_template_n"])
            for r in template_rollup(pages).collect()
        }
        assert got == {"h1": (3, 2, 2), "h2": (1, 1, 1)}

    def test_binary_column_path(self, spark):
        pages = spark.createDataFrame(
            [("h", bytearray(b"<html><body></body></html>"))],
            "host string, html binary",
        )
        row = with_structure_sig(pages).first()
        assert len(row["structure_sig"]) == 16


class TestPlanShape:
    def test_pure_catalyst(self, spark):
        from readur_spark.queries.registry import queries

        df = queries()["template_fingerprint_rollup"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        assert "Window" not in plan
