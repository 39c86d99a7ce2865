"""License detection (ml/license.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: hostile
rel=license tag shapes, CC-URL normalization edges, the permissive
gate's restriction-token logic, and the zero-Python plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.license import (
    is_permissive,
    license_href,
    license_id,
    with_license,
)


def _lic(spark, html: str):
    row = (
        spark.range(1)
        .select(license_href(F.lit(html)).alias("h"))
        .select(F.col("h"), license_id(F.col("h")).alias("l"))
        .first()
    )
    return row["h"], row["l"]


CC = "https://creativecommons.org/licenses/by/4.0/"


class TestTagShapes:
    def test_plain_anchor(self, spark):
        h, l = _lic(spark, f'<a rel="license" href="{CC}">x</a>')
        assert (h, l) == (CC, "cc-by-4.0")

    def test_rel_after_href(self, spark):
        h, l = _lic(spark, f'<a href="{CC}" rel="license">x</a>')
        assert (h, l) == (CC, "cc-by-4.0")

    def test_link_tag_single_quotes_upper(self, spark):
        h, l = _lic(spark, f"<LINK REL='license' HREF='{CC}'>")
        assert (h, l) == (CC, "cc-by-4.0")

    def test_multi_token_rel(self, spark):
        h, l = _lic(spark, f'<a rel="license nofollow" href="{CC}">x</a>')
        assert l == "cc-by-4.0"

    def test_rel_licenses_page_no_match(self, spark):
        # 'license' must be a whole rel token
        h, l = _lic(spark, f'<a rel="licenses-page" href="{CC}">x</a>')
        assert h is None and l is None

    def test_anchor_without_rel_ignored(self, spark):
        h, l = _lic(spark, f'<a href="{CC}">x</a>')
        assert h is None and l is None

    def test_first_of_many_wins(self, spark):
        html = (
            f'<a rel="license" href="{CC}">a</a>'
            '<a rel="license" href="https://creativecommons.org'
            '/licenses/by-sa/3.0/">b</a>'
        )
        _, l = _lic(spark, html)
        assert l == "cc-by-4.0"


class TestNormalization:
    def test_deed_suffix_and_http(self, spark):
        _, l = _lic(
            spark,
            '<a rel="license" href="http://creativecommons.org'
            '/licenses/by-nc-sa/2.0/deed.fr">x</a>',
        )
        assert l == "cc-by-nc-sa-2.0"

    def test_cc0(self, spark):
        _, l = _lic(
            spark,
            '<a rel="license" href="https://creativecommons.org'
            '/publicdomain/zero/1.0/">x</a>',
        )
        assert l == "cc0-1.0"

    def test_pd_mark(self, spark):
        _, l = _lic(
            spark,
            '<a rel="license" href="https://creativecommons.org'
            '/publicdomain/mark/1.0/">x</a>',
        )
        assert l == "publicdomain-mark-1.0"

    def test_non_cc_target_is_other(self, spark):
        _, l = _lic(
            spark,
            '<a rel="license" href="https://example.com/terms">x</a>',
        )
        assert l == "other"


class TestPermissive:
    def _perm(self, spark, lic):
        return spark.range(1).select(
            is_permissive(F.lit(lic)).alias("p")
        ).first()["p"]

    def test_matrix(self, spark):
        cases = {
            "cc-by-4.0": True,
            "cc-by-sa-3.0": True,
            "cc0-1.0": True,
            "publicdomain-mark-1.0": True,
            "cc-by-nc-4.0": False,
            "cc-by-nd-4.0": False,
            "cc-by-nc-nd-2.5": False,
            "cc-by-nc-sa-2.0": False,
            "other": False,
            None: False,
        }
        for lic, want in cases.items():
            assert self._perm(spark, lic) is want, lic

    def test_nd_token_not_substring(self, spark):
        # a hypothetical family containing 'nd' INSIDE a token must
        # not trip the restriction match (token-bounded regex)
        assert self._perm(spark, "cc-bynd-1.0") is True


def test_zero_python_plan(spark):
    df = spark.range(3).select(
        F.concat(F.lit('<a rel="license" href="'), F.lit(CC),
                 F.lit('">x</a>')).alias("html")
    )
    plan = (
        with_license(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
