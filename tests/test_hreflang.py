"""hreflang translation clusters (ml/hreflang.py).

Full DuckDB value-hash runs in test_entry_contract.py; here:
attribute-order independence, x-default handling, the declared-vs-
crawled asymmetry on the truncated tail group, and the zero-Python
plan."""

from __future__ import annotations

from readur_spark.ml.hreflang import (
    constructed_hreflang_pages,
    hreflang_cluster_census,
    hreflang_edges,
)

SF = "/root/testdata/sf0.001"


def _edges(spark, html: str):
    df = spark.createDataFrame(
        [("https://h.example/p", html)], ["url", "html_str"]
    )
    return sorted(
        hreflang_edges(df).collect(), key=lambda r: r["hreflang"]
    )


class TestEdgeKernel:
    def test_attribute_order_free(self, spark):
        html = (
            '<link rel="alternate" hreflang="de" href="https://h/de"/>'
            '<link href="https://h/en" hreflang="en" rel="alternate"/>'
            '<link rel="alternate" type="text/html" hreflang="fr"'
            ' href="https://h/fr"/>'
        )
        rows = _edges(spark, html)
        assert [(r["hreflang"], r["alt_url"]) for r in rows] == [
            ("de", "https://h/de"),
            ("en", "https://h/en"),
            ("fr", "https://h/fr"),
        ]

    def test_non_alternate_links_ignored(self, spark):
        html = (
            '<link rel="stylesheet" href="https://h/a.css"/>'
            '<link rel="canonical" href="https://h/c"/>'
        )
        assert _edges(spark, html) == []

    def test_hreflang_without_href_dropped(self, spark):
        html = '<link rel="alternate" hreflang="de"/>'
        assert _edges(spark, html) == []


class TestCensus:
    def _census(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        edges = hreflang_edges(constructed_hreflang_pages(docs))
        return {
            r["cluster_id"]: r
            for r in hreflang_cluster_census(edges).collect()
        }

    def test_full_groups(self, spark):
        census = self._census(spark)
        # group 0: docs 0,1,2 — de variant on src0
        r = census["https://src0.example/de/art/0"]
        assert r["n_pages"] == 3
        assert r["langs"] == "de,en,fr"

    def test_truncated_tail_declared_vs_crawled(self, spark):
        census = self._census(spark)
        # group 166: only docs 498 (de) and 499 (en) exist, but both
        # declare all three languages; min-url cluster id is the
        # (uncrawled) fr sibling on src0 — 500 % 20 = 0 sorts first
        r = census["https://src0.example/fr/art/166"]
        assert r["n_pages"] == 2
        assert r["n_langs"] == 3

    def test_cluster_count(self, spark):
        assert len(self._census(spark)) == 167

    def test_xdefault_not_a_language(self, spark):
        for r in self._census(spark).values():
            assert "x-default" not in r["langs"]


class TestPlan:
    def test_zero_python(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        edges = hreflang_edges(constructed_hreflang_pages(docs))
        plan = (
            hreflang_cluster_census(edges)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
