"""ml/urlfilters.py — URL-level curation gates."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.urlfilters import (
    registrable_domain,
    url_host,
    with_url_gates,
)
from readur_spark.plans.audit import has_broadcast_join, shuffle_count


def _hosts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r["h"] for r in df.select(url_host(F.col("url")).alias("h")).collect()
    ]


class TestParsing:
    def test_url_host(self, spark):
        got = _hosts(
            spark,
            [
                "https://example.com/a/b?q=1",
                "http://Sub.Example.COM:8080/x",
                "ftp://files.example.org",
                "not a url",
                "https://1.2.3.4/x",
            ],
        )
        assert got == [
            "example.com",
            "sub.example.com",  # port split off by the [^/:?#] class
            "files.example.org",
            "",
            "1.2.3.4",
        ]

    def test_registrable_domain(self, spark):
        df = spark.createDataFrame(
            [("a.b.example.com",), ("example.com",), ("localhost",), ("",)],
            "host string",
        )
        got = [
            r["d"]
            for r in df.select(
                registrable_domain(F.col("host")).alias("d")
            ).collect()
        ]
        assert got == ["example.com", "example.com", "localhost", ""]


class TestGates:
    @pytest.fixture(scope="class")
    def gated(self, spark):
        urls = [
            ("https://good.example.com/page", True),
            ("https://1.2.3.4/page", False),              # ip host
            ("https://h.example.com:8080/x", False),      # explicit port
            ("https://casino.example.com/slots", False),  # badword
            ("https://x.com/" + "a" * 3000, False),       # too long
            ("garbage", False),                           # bad host
            ("https://evil.blocked.net/x", False),        # sub of blocked
            ("https://blocked.net/x", False),             # blocked exactly
        ]
        bl = spark.createDataFrame([("blocked.net",)], "domain string")
        df = spark.createDataFrame(
            [(u,) for u, _ in urls], "url string"
        )
        out = with_url_gates(df, bl)
        return {r["url"]: r.asDict() for r in out.collect()}, dict(urls)

    def test_keep_decisions(self, gated):
        rows, expect = gated
        for url, want in expect.items():
            assert rows[url]["url_keep"] is want, url

    def test_blocklist_matches_subdomains(self, gated):
        rows, _ = gated
        assert rows["https://evil.blocked.net/x"]["url_blocked_domain"]
        assert rows["https://blocked.net/x"]["url_blocked_domain"]
        assert not rows["https://good.example.com/page"]["url_blocked_domain"]

    def test_port_flag(self, spark):
        df = spark.createDataFrame(
            [("https://h.example.com:8080/x",), ("https://h.example.com/x",)],
            "url string",
        )
        rows = {r["url"]: r for r in with_url_gates(df).collect()}
        ported = rows["https://h.example.com:8080/x"]
        # the host class stops at ':' so the parsed host is clean, but
        # the port is still flagged from the raw authority:
        assert ported["host"] == "h.example.com"
        assert ported["url_has_port"]
        assert not rows["https://h.example.com/x"]["url_has_port"]

    def test_no_blocklist_means_no_domain_drops(self, spark):
        df = spark.createDataFrame(
            [("https://anything.net/x",)], "url string"
        )
        row = with_url_gates(df, None).first()
        assert not row["url_blocked_domain"] and row["url_keep"]


class TestPlanShape:
    def test_broadcast_and_no_corpus_shuffle(self, spark):
        df = spark.createDataFrame(
            [(f"https://h{i}.example.net/d{i}",) for i in range(100)],
            "url string",
        )
        bl = spark.createDataFrame([("x.net",)], "domain string")
        out = with_url_gates(df, bl)
        assert has_broadcast_join(out)
        # the only exchange dedups the K-row blocklist dimension —
        # the corpus side reaches the broadcast join shuffle-free
        assert shuffle_count(out) <= 1
        assert shuffle_count(with_url_gates(df, None)) == 0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


class TestDomainCap:
    def test_cap_and_determinism(self, spark):
        from readur_spark.ml.urlfilters import domain_cap_sample

        rows = [(f"https://{'big' if i % 4 else 'small'}.net/d{i}",)
                for i in range(100)]
        df = spark.createDataFrame(rows, "url string")
        out = domain_cap_sample(df, 5)
        counts = {r["domain"]: r["n"] for r in
                  out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
        assert counts["big.net"] == 5    # 75 rows capped to 5
        assert counts["small.net"] == 5  # 25 rows capped to 5
        # content-addressed: same winners under any partitioning
        a = sorted(r["url"] for r in out.collect())
        b = sorted(
            r["url"]
            for r in domain_cap_sample(df.repartition(13), 5).collect()
        )
        assert a == b

    def test_under_cap_domains_untouched(self, spark):
        from readur_spark.ml.urlfilters import domain_cap_sample

        df = spark.createDataFrame(
            [(f"https://h{i}.org/x",) for i in range(7)], "url string"
        )
        assert domain_cap_sample(df, 10).count() == 7


class TestDepthYield:
    def test_depth_parse_and_gate(self, spark):
        from readur_spark.ml.urlfilters import depth_yield_table

        rows = [
            ("https://h.example/doc1.html", " ".join(["w"] * 60)),
            ("https://h.example/a/b/doc2.html", "short"),
            ("https://h.example/a/b/doc3.html", " ".join(["w"] * 60)),
        ]
        df = spark.createDataFrame(rows, "url string, text string")
        got = {r["depth"]: r for r in depth_yield_table(df).collect()}
        assert got[1]["n_docs"] == 1 and got[1]["yield_permille"] == 1000
        assert got[3]["n_docs"] == 2 and got[3]["n_kept"] == 1
        assert got[3]["yield_permille"] == 500
