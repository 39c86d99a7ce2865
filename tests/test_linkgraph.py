"""ml/linkgraph.py — outlink extraction and integer PageRank."""

from __future__ import annotations

import pytest

from readur_spark.ml.linkgraph import (
    DAMPING_PCT,
    SCALE,
    extract_outlink_hosts,
    outlink_edges,
    pagerank_fixed_point,
)


# ---- plain-Python PageRank reference (same update rule) ----------------


def _py_pagerank(edges, iters, damp=DAMPING_PCT, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg: dict = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((100 - damp) * (scale // n)) // 100
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        sums = {v: 0 for v in nodes}
        for s, d in edges:
            sums[d] += r[s] // outdeg[s]
        r = {v: base + (damp * sums[v]) // 100 for v in nodes}
    return r


GOLDEN_HTML = b"""<html><body>
<a href="https://other.example/page">x</a>
<a href='http://UPPER.Example/y'>y</a>
<a href=/relative/z>z</a>
<a href="#frag">skip</a>
<a href="javascript:void(0)">skip</a>
<a href="mailto:a@b.c">skip</a>
<a href="ftp://files.example/f">skip</a>
<p>no links here</p>
<a class="btn" href="../up">up</a>
</body></html>"""


class TestOutlinkKernel:
    def test_golden_html(self):
        hosts = extract_outlink_hosts("https://src.example/a/b.html", GOLDEN_HTML)
        assert hosts == [
            "other.example",   # absolute https
            "upper.example",   # single-quoted, lowercased
            "src.example",     # relative resolves to page host
            "src.example",     # ../up resolves to page host
        ]

    def test_empty_and_none(self):
        assert extract_outlink_hosts("https://a.example/", None) == []
        assert extract_outlink_hosts("https://a.example/", b"") == []
        assert extract_outlink_hosts("https://a.example/", b"<p>none</p>") == []

    def test_edges_aggregate(self, spark):
        pages = spark.createDataFrame(
            [
                ("https://a.example/1", GOLDEN_HTML),
                ("https://a.example/2", b'<a href="https://other.example/q">l</a>'),
            ],
            "url string, html binary",
        )
        got = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in outlink_edges(pages).collect()
        }
        assert got == {
            ("a.example", "other.example"): 2,
            ("a.example", "upper.example"): 1,
            ("a.example", "a.example"): 2,
        }


GRAPH = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),  # 3 is the hub
    (5, 5),                                   # self loop
    (2, 9),                                   # 9 is dangling (no outlinks)
]


class TestPagerank:
    @pytest.fixture(scope="class")
    def ranks(self, spark):
        edges = spark.createDataFrame(GRAPH, "src long, dst long")
        return {
            r["node"]: r["rank"]
            for r in pagerank_fixed_point(edges, 5).collect()
        }

    def test_exact_vs_python(self, ranks):
        assert ranks == _py_pagerank(GRAPH, 5)

    def test_hub_cycle_outranks_leaves(self, ranks):
        # 3 collects from 1, 2, 4 and feeds everything back to 1: the
        # 1<->3 cycle holds the most mass; 4 (no inlinks) holds the least.
        top_two = sorted(ranks, key=ranks.get, reverse=True)[:2]
        assert set(top_two) == {1, 3}
        assert min(ranks, key=ranks.get) == 4

    def test_dangling_mass_leaks(self, ranks):
        # node 9 absorbs but never redistributes: total mass < scale
        assert sum(ranks.values()) < SCALE

    def test_zero_iters_is_uniform(self, spark):
        edges = spark.createDataFrame(GRAPH, "src long, dst long")
        r0 = {
            r["node"]: r["rank"]
            for r in pagerank_fixed_point(edges, 0).collect()
        }
        n = len({s for s, _ in GRAPH} | {d for _, d in GRAPH})
        assert set(r0.values()) == {SCALE // n}

    def test_empty_graph(self, spark):
        edges = spark.createDataFrame([], "src long, dst long")
        assert pagerank_fixed_point(edges, 3).collect() == []

    def test_weighted_equals_expanded(self, spark):
        """Pre-aggregated (src, dst, n) edges + weight_col must be
        bit-identical to re-expanding the parallel links (ADVICE r4:
        outlink_edges output composed into PageRank must not collapse
        multiplicity)."""
        multi = GRAPH + [(1, 2), (1, 2), (4, 3)]  # parallel links
        agg: dict = {}
        for s, d in multi:
            agg[(s, d)] = agg.get((s, d), 0) + 1
        weighted = spark.createDataFrame(
            [(s, d, n) for (s, d), n in agg.items()],
            "src long, dst long, n_links long",
        )
        expanded = spark.createDataFrame(multi, "src long, dst long")
        got_w = {
            r["node"]: r["rank"]
            for r in pagerank_fixed_point(
                weighted, 5, weight_col="n_links"
            ).collect()
        }
        got_e = {
            r["node"]: r["rank"]
            for r in pagerank_fixed_point(expanded, 5).collect()
        }
        assert got_w == got_e


ANCHOR_HTML = b"""<html><body>
<a href="https://t.example/a"><b>Click</b> <i>here</i> now</a>
<a href="https://t.example/b">   spaced   out   </a>
<a href="https://img.example/i"><img src="x.png"/></a>
<a href="/local">local page</a>
<a href="#x">fragment text</a>
</body></html>"""


class TestAnchorText:
    def test_golden_anchors(self):
        from readur_spark.ml.linkgraph import extract_anchors

        got = extract_anchors("https://src.example/p", ANCHOR_HTML)
        assert got == [
            ("t.example", "Click here now"),   # nested tags stripped
            ("t.example", "spaced out"),       # whitespace normalized
            ("src.example", "local page"),     # relative resolves
        ]  # image-only anchor and fragment dropped

    def test_term_profile(self, spark):
        from readur_spark.ml.linkgraph import anchor_term_profile

        pages = spark.createDataFrame(
            [
                ("https://a.example/1", ANCHOR_HTML),
                ("https://a.example/2",
                 b'<a href="https://t.example/c">click twice</a>'),
            ],
            "url string, html binary",
        )
        got = {
            (r["dst_host"], r["term"]): r["n"]
            for r in anchor_term_profile(pages).collect()
        }
        assert got[("t.example", "click")] == 2
        assert got[("t.example", "here")] == 1
        assert got[("a.example", "local")] == 1  # relative -> page host
        assert ("img.example", "x") not in got


class TestAnchorQueryPairs:
    def test_idf_ranks_discriminative_terms(self, spark):
        from readur_spark.ml.linkgraph import anchor_query_pairs

        # 4 hosts; 'common' hits all (idf 0); 'rare' hits one (idf 2)
        rows = []
        for h in range(4):
            rows.append((f"h{h}", "common", 9))
        rows.append(("h0", "rare", 1))
        df = spark.createDataFrame(rows, "dst_host string, term string, n long")
        got = anchor_query_pairs(df).collect()
        h0 = sorted([r for r in got if r["dst_host"] == "h0"],
                    key=lambda r: r["rank"])
        # weight: rare = 1·floor(log2(4//1))=2 beats common = 9·0
        assert h0[0]["term"] == "rare" and h0[0]["weight"] == 2
        assert h0[0]["idf_bits"] == 2 and h0[0]["df_hosts"] == 1
        assert h0[1]["term"] == "common" and h0[1]["weight"] == 0

    def test_topk_cap(self, spark):
        from readur_spark.ml.linkgraph import ANCHOR_TOPK, anchor_query_pairs

        rows = [("h0", f"t{i}", 1) for i in range(10)]
        df = spark.createDataFrame(rows, "dst_host string, term string, n long")
        got = anchor_query_pairs(df).collect()
        assert len(got) == ANCHOR_TOPK
