"""Heading-path chunking (ml/headings.py).

Full DuckDB value-hash runs in test_entry_contract.py (the oracle
restates every breadcrumb/chunk from the construction rule); here:
state transitions the constructed corpus can't reach (h2 before any
h1, consecutive h2s, headingless pages), in-order joining, and the
zero-Python plan."""

from __future__ import annotations

from readur_spark.ml.headings import heading_chunks

SF = "/root/testdata/sf0.001"


def _pages(spark, html):
    return spark.createDataFrame([("u", html)], ["url", "html_str"])


def _chunks(spark, html):
    return {
        r["chunk_idx"]: (r["heading_path"], r["chunk_text"], r["n_paras"])
        for r in heading_chunks(_pages(spark, html)).collect()
    }


class TestStateMachine:
    def test_basic_breadcrumbs(self, spark):
        html = (
            "<h1>T</h1><p>intro</p>"
            "<h2>A</h2><p>a1</p><p>a2</p>"
            "<h2>B</h2><p>b1</p>"
        )
        assert _chunks(spark, html) == {
            0: ("T", "intro", 1),
            1: ("T > A", "a1 a2", 2),
            2: ("T > B", "b1", 1),
        }

    def test_new_h1_resets_h2(self, spark):
        html = (
            "<h1>T1</h1><h2>S</h2><p>x</p>"
            "<h1>T2</h1><p>y</p>"  # y governed by T2 alone, not T1 > S
        )
        got = _chunks(spark, html)
        assert got[0] == ("T1 > S", "x", 1)
        assert got[1] == ("T2", "y", 1)

    def test_h2_before_any_h1(self, spark):
        html = "<h2>Orphan</h2><p>z</p>"
        assert _chunks(spark, html) == {0: (" > Orphan", "z", 1)}

    def test_headingless_page(self, spark):
        html = "<p>only</p><p>paras</p>"
        assert _chunks(spark, html) == {0: ("", "only paras", 2)}

    def test_heading_with_no_paragraphs_emits_nothing(self, spark):
        assert _chunks(spark, "<h1>T</h1><h2>Empty</h2>") == {}


class TestPackingChain:
    def test_offsets_contiguous_per_shard(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["chunk_packing_plan"](spark, SF).collect()
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        assert len(by_shard) > 1
        for shard, rs in by_shard.items():
            rs.sort(key=lambda r: r["chunk_uid"])
            # prefix sums: each chunk starts where the previous ended
            assert rs[0]["start_offset"] == 0, shard
            for a, b in zip(rs, rs[1:]):
                assert b["start_offset"] > a["start_offset"], shard
        # a page's chunks stay adjacent in uid order inside the shard
        pages = {r["chunk_uid"].rsplit("#", 1)[0] for r in rows}
        assert len(pages) < len(rows)  # multi-chunk pages exist

    def test_boundary_spans_flagged(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["chunk_packing_plan"](spark, SF).collect()
        spanning = [r for r in rows if r["spans_boundary"]]
        assert spanning  # the 16-token bins force crossings
        for r in spanning:
            assert r["chunk_last"] > r["chunk_first"]


class TestPlan:
    def test_no_python_and_bounded_shuffles(self, spark):
        from readur_spark.plans.audit import shuffle_count
        from readur_spark.queries.registry import queries

        df = queries()["heading_path_chunks"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        # window + group + rank all key on url: bounded exchanges
        assert shuffle_count(df) <= 3
