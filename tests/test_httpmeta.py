"""HTTP-header curation signals (ml/httpmeta.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: hostile
header shapes, the X-Robots token rules, the opt-out ladder, and the
zero-Python plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.httpmeta import (
    fetchable,
    header_value,
    parse_http_headers,
    with_optout,
    xrobots_has,
)


def _hv(spark, headers: str, name: str):
    return spark.range(1).select(
        header_value(F.lit(headers), name).alias("v")
    ).first()["v"]


class TestHeaderValue:
    def test_case_insensitive_name(self, spark):
        assert _hv(spark, "X-ROBOTS-TAG: noai\r\n", "x-robots-tag") == "noai"

    def test_bare_lf_and_crlf(self, spark):
        assert _hv(spark, "A: 1\nB: 2\r\nC: 3", "b") == "2"

    def test_first_of_repeated_wins(self, spark):
        assert _hv(spark, "A: one\r\nA: two\r\n", "a") == "one"

    def test_name_must_start_line(self, spark):
        # 'Not-X-Robots-Tag:' must not match 'x-robots-tag'
        assert _hv(spark, "Not-X-Robots-Tag: noai\r\n", "x-robots-tag") is None

    def test_optional_whitespace_and_trailing_space(self, spark):
        assert _hv(spark, "A\t: \t v  \r\n", "a") == "v"

    def test_absent_is_null(self, spark):
        assert _hv(spark, "A: 1\r\n", "b") is None


class TestXRobots:
    def _has(self, spark, val, d):
        return spark.range(1).select(
            xrobots_has(F.lit(val), d).alias("x")
        ).first()["x"]

    def test_token_list(self, spark):
        assert self._has(spark, "noindex, nofollow", "noindex") is True
        assert self._has(spark, "NOINDEX", "noindex") is True
        assert self._has(spark, " noai ", "noai") is True

    def test_substring_not_token(self, spark):
        assert self._has(spark, "noindexing", "noindex") is False
        assert self._has(spark, "noimageai", "noai") is False

    def test_null_is_false(self, spark):
        assert self._has(spark, None, "noindex") is False


def _frame(spark, headers: str):
    return spark.createDataFrame([(headers,)], "headers string")


class TestOptoutLadder:
    def test_noindex_beats_noai_and_tdm(self, spark):
        df = _frame(
            spark,
            "X-Robots-Tag: noai, noindex\r\nTDM-Reservation: 1\r\n",
        )
        row = with_optout(parse_http_headers(df)).first()
        assert row["opt_out_reason"] == "noindex"

    def test_tdm_zero_is_a_grant(self, spark):
        df = _frame(spark, "TDM-Reservation: 0\r\n")
        assert fetchable(parse_http_headers(df)).count() == 1

    def test_tdm_one_blocks(self, spark):
        df = _frame(spark, "TDM-Reservation: 1\r\n")
        assert fetchable(parse_http_headers(df)).count() == 0

    def test_all_directive_is_fetchable(self, spark):
        df = _frame(spark, "X-Robots-Tag: all\r\n")
        assert fetchable(parse_http_headers(df)).count() == 1

    def test_content_type_parsed(self, spark):
        df = _frame(
            spark, 'Content-Type: Text/HTML; charset="ISO-8859-1"\r\n'
        )
        row = parse_http_headers(df).first()
        assert row["mime"] == "text/html"
        assert row["charset"] == "iso-8859-1"


def test_zero_python_plan(spark):
    df = _frame(spark, "Content-Type: text/html\r\n")
    plan = (
        with_optout(parse_http_headers(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "MapInPandas" not in plan
