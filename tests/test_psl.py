"""PSL registered-domain extraction (ml/psl.py): the public list's own
documented test shapes, plus plan purity."""

import pytest

from readur_spark.ml.psl import psl_rules_df, registered_domains

SF = "/root/testdata/sf0.001"


def _run(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = registered_domains(df, psl_rules_df(spark)).collect()
    return {r.host: (r.public_suffix, r.registered_domain) for r in rows}


class TestPslVectors:
    def test_normal_rules(self, spark):
        got = _run(spark, ["example.com", "a.b.example.com",
                           "example.co.uk", "deep.example.co.uk"])
        assert got["example.com"] == ("com", "example.com")
        assert got["a.b.example.com"] == ("com", "example.com")
        # co.uk beats uk on length
        assert got["example.co.uk"] == ("co.uk", "example.co.uk")
        assert got["deep.example.co.uk"] == ("co.uk", "example.co.uk")

    def test_wildcard_rule(self, spark):
        # *.kobe.jp: the public suffix is one label deeper
        got = _run(spark, ["foo.kobe.jp", "a.foo.kobe.jp"])
        assert got["a.foo.kobe.jp"] == ("foo.kobe.jp", "a.foo.kobe.jp")
        # the wildcard match itself IS a public suffix
        assert got["foo.kobe.jp"] == ("foo.kobe.jp", "")

    def test_exception_beats_wildcard(self, spark):
        # !city.kobe.jp punches a hole in *.kobe.jp
        got = _run(spark, ["city.kobe.jp", "x.city.kobe.jp", "www.ck",
                           "sub.www.ck", "other.ck"])
        assert got["city.kobe.jp"] == ("kobe.jp", "city.kobe.jp")
        assert got["x.city.kobe.jp"] == ("kobe.jp", "city.kobe.jp")
        assert got["www.ck"] == ("ck", "www.ck")
        assert got["sub.www.ck"] == ("ck", "www.ck")
        # non-excepted *.ck host: wildcard applies
        assert got["other.ck"] == ("other.ck", "")

    def test_default_rule_unknown_tld(self, spark):
        got = _run(spark, ["example.weird", "a.example.weird", "weird"])
        assert got["example.weird"] == ("weird", "example.weird")
        assert got["a.example.weird"] == ("weird", "example.weird")
        # host IS the (default) public suffix
        assert got["weird"] == ("weird", "")

    def test_host_is_listed_suffix(self, spark):
        got = _run(spark, ["com", "co.uk"])
        assert got["com"] == ("com", "")
        assert got["co.uk"] == ("co.uk", "")

    def test_last_two_labels_would_be_wrong(self, spark):
        # the exact case the urlfilters docstring names: two distinct
        # co.uk sites must NOT collapse onto one pseudo-domain
        got = _run(spark, ["a.site1.co.uk", "b.site2.co.uk"])
        regs = {v[1] for v in got.values()}
        assert regs == {"site1.co.uk", "site2.co.uk"}


class TestPlanPurity:
    def test_no_python_eval(self, spark):
        from readur_spark.queries.registry import queries

        plan = (
            queries()["psl_registered_domain"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan

    def test_rule_join_is_broadcast(self, spark):
        from readur_spark.queries.registry import queries

        plan = (
            queries()["psl_registered_domain"](spark, SF)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
