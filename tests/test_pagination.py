"""Pagination stitching (ml/pagination.py).

Full DuckDB value-hash runs in test_entry_contract.py (the oracle
restates stitched text from the construction rule, independent of the
pointer-doubling path); here: in-order stitching, the circular-chain
policy, the doubling-depth boundary, text conservation, and the
zero-Python parse plan."""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.pagination import (
    constructed_paginated_pages,
    rel_link,
    stitch_paginated,
)

SF = "/root/testdata/sf0.001"


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html_str", "text"])


def _chain(n: int, base: str = "https://h/a"):
    rows = []
    for p in range(n):
        prev = (
            f'<link rel="prev" href="{base}/{p - 1}"/>' if p > 0 else ""
        )
        rows.append((f"{base}/{p}", f"<head>{prev}</head>", f"part{p}"))
    return rows


class TestStitch:
    def test_three_parts_in_order(self, spark):
        out = stitch_paginated(_pages(spark, _chain(3))).collect()
        assert len(out) == 1
        r = out[0]
        assert r["head_url"] == "https://h/a/0"
        assert r["stitched_text"] == "part0 part1 part2"
        assert r["n_parts"] == 3 and not r["is_loop"]

    def test_standalone_passthrough(self, spark):
        rows = [("https://h/solo", "<head></head>", "alone")]
        r = stitch_paginated(_pages(spark, rows)).first()
        assert r["head_url"] == "https://h/solo"
        assert r["stitched_text"] == "alone" and r["n_parts"] == 1

    def test_eight_part_chain_at_doubling_boundary(self, spark):
        # rounds=3 resolves up to 2^3 = 8 hops — a 9-page chain's last
        # page sits exactly at 8 hops and must still stitch
        out = stitch_paginated(_pages(spark, _chain(9))).collect()
        assert len(out) == 1
        assert out[0]["stitched_text"] == " ".join(
            f"part{p}" for p in range(9)
        )

    def test_circular_chain_keeps_text_and_flags(self, spark):
        rows = [
            ("https://h/x", '<head><link rel="prev" href="https://h/y"/></head>', "tx"),
            ("https://h/y", '<head><link rel="prev" href="https://h/x"/></head>', "ty"),
        ]
        out = {r["head_url"]: r for r in
               stitch_paginated(_pages(spark, rows)).collect()}
        assert set(out) == {"https://h/x", "https://h/y"}
        assert all(r["is_loop"] for r in out.values())
        assert {r["stitched_text"] for r in out.values()} == {"tx", "ty"}


class TestConservation:
    def test_no_text_lost_on_constructed_corpus(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        stitched = stitch_paginated(constructed_paginated_pages(docs))
        total_in = docs.agg(F.sum(F.length("text"))).first()[0]
        agg = stitched.agg(
            F.sum(F.length("stitched_text")).alias("chars"),
            F.sum("n_parts").alias("parts"),
        ).first()
        # joiner spaces: one per extra part
        n_docs = docs.count()
        assert agg["parts"] == n_docs
        assert agg["chars"] == total_in + (n_docs - stitched.count())

    def test_loop_free_constructed_corpus(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        stitched = stitch_paginated(constructed_paginated_pages(docs))
        assert stitched.filter("is_loop").count() == 0


class TestParsePlan:
    def test_rel_link_zero_python(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        pages = constructed_paginated_pages(docs)
        plan = (
            rel_link(pages, "prev")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
