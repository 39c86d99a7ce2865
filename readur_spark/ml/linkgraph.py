"""Web link graph: outlink extraction and fixed-point PageRank.

The reference engine (yonasBSD/readur) tracks per-source crawl
relationships only implicitly (webdav directory trees,
src/services/webdav/); a Common-Crawl-scale curation pipeline needs the
explicit host link graph — for spam/boilerplate host scoring, crawl
prioritization, and graph-signal quality features (the public
CommonCrawl host-level web-graph releases are exactly this artifact).

Two tiers:

  1. `outlink_edges` — href extraction from raw HTML payloads into
     (src_host, dst_host) edges: a slim (url, html) projection through
     one Arrow-batched mapInPandas (the payload is read once and never
     shuffled; the emitted edge stream is two short strings per link);
  2. `pagerank_fixed_point` — PageRank in EXACT integer arithmetic:
     ranks are longs scaled by `scale`, the damping update is

         r'(v) = base + (damping_pct * sum_{u->v} (r(u) div outdeg(u)))
                        div 100
         base  = ((100 - damping_pct) * (scale div N)) div 100

     All operands are non-negative longs, so Spark's truncating `div`
     and DuckDB's flooring `//` agree — the K-iteration fixed point is
     bit-identical on every engine (the repo's no-libm ranking
     convention, see operators/posting.py, ml/quality_lm.py). Mass from
     dangling nodes (no outlinks) leaks, as in the classic large-scale
     formulation; `scale` keeps enough headroom that K iterations never
     overflow (rank <= scale, damping_pct * scale < 2^63).

Scale design (10^12 edges):
  - extraction touches the payload exactly once; edges are slim strings
    and aggregate map-side into (src, dst, n_links);
  - the iteration state is ONE slim (node, rank) table; each step is a
    ranks-to-edges equi-join on src (edges pre-aggregated with their
    out-degree, partitioned once on src and persisted so every
    iteration reuses the same layout) followed by a groupBy(dst) sum —
    two shuffles of longs per step, payload never involved;
  - K is small (PageRank converges geometrically; the public web-graph
    releases use ~20-50 iterations); iterations chain lazily and a
    persist+count lands only every `materialize_every` steps, so plan
    depth stays bounded without a scheduler round-trip per step.
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urljoin, urlparse

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load, table_row_count

DAMPING_PCT = 85
SCALE = 10**12

# href attribute of <a> tags: double-quoted, single-quoted, or bare.
_HREF_RE = re.compile(
    r"<a\s[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))",
    re.IGNORECASE | re.DOTALL,
)


def extract_outlink_hosts(page_url: str, html: bytes | None) -> list[str]:
    """Target hosts of every <a href> in the page, relative links
    resolved against the page url; http(s) targets only; hosts
    lowercased. One list entry per link occurrence (callers decide
    whether to weight or dedup)."""
    if not html:
        return []
    text = html.decode("utf-8", "replace")
    hosts: list[str] = []
    for m in _HREF_RE.finditer(text):
        href = next(g for g in m.groups() if g is not None).strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        try:
            absolute = urljoin(page_url, href)
            parsed = urlparse(absolute)
        except ValueError:
            continue
        if parsed.scheme in ("http", "https") and parsed.hostname:
            hosts.append(parsed.hostname.lower())
    return hosts


def outlink_edges(pages: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) host-level edge list from raw
    pages. The payload crosses the Python boundary once, in Arrow
    batches, through a two-column projection."""
    slim = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out_src: list[str] = []
            out_dst: list[str] = []
            for url, html in zip(batch["url"], batch["html"]):
                src = urlparse(url).hostname
                if not src:
                    continue
                src = src.lower()
                for dst in extract_outlink_hosts(
                    url, bytes(html) if html is not None else None
                ):
                    out_src.append(src)
                    out_dst.append(dst)
            yield pd.DataFrame({"src_host": out_src, "dst_host": out_dst})

    edges = slim.mapInPandas(run, schema="src_host string, dst_host string")
    return edges.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def pagerank_fixed_point(
    edges: DataFrame,
    num_iters: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping_pct: int = DAMPING_PCT,
    scale: int = SCALE,
    materialize_every: int = 8,
) -> DataFrame:
    """K-iteration integer PageRank over an edge list. Returns
    (node, rank) with rank on the `scale` fixed-point grid. Parallel
    edges contribute once per occurrence; self-loops are kept. See the
    module docstring for the exact update rule.

    `weight_col` names an integer multiplicity column — pass it when
    feeding PRE-AGGREGATED edges (e.g. `outlink_edges` output with its
    n_links column), where each row stands for n parallel links: the
    out-degree becomes sum(weight) and each row contributes
    rank*weight div wdeg, exactly equal to re-expanding the rows.
    Without it, a pre-aggregated edge list would silently collapse
    parallel links to weight 1.

    Iterations CHAIN LAZILY — each rank frame feeds the next as plan
    lineage, so K steps execute as one job (Spark pipelines the 2K
    shuffle stages; AQE right-sizes each). Only every
    `materialize_every`-th step persists + materializes, bounding plan
    depth for large K without paying a scheduler round-trip per step
    (measured: eager per-step counts cost ~1.5 s/step of pure job
    latency on a 5k-node graph)."""
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    base = ((100 - damping_pct) * (scale // n)) // 100
    # out-degree rides WITH the edge rows: one layout, reused each step.
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    deg = edges.groupBy(src.alias("node")).agg(F.sum(w).alias("outdeg"))
    adj = (
        edges.select(src.alias("node"), dst.alias("dst"), w.alias("w"))
        .join(deg, "node")
        .repartition("node")
        .persist()
    )
    nodes = nodes.persist()
    ranks = nodes.select(
        "node", F.lit(scale // n).cast("long").alias("rank")
    )
    materialized: DataFrame | None = None
    try:
        for step in range(1, num_iters + 1):
            sums = (
                adj.join(ranks, "node")
                .select(
                    F.col("dst").alias("node"),
                    # w * (rank div outdeg), NOT (rank*w) div outdeg:
                    # per-grid-unit truncation first keeps the weighted
                    # run bit-identical to re-expanding parallel edges.
                    F.expr("w * (rank div outdeg)").alias("contrib"),
                )
                .groupBy("node")
                .agg(F.sum("contrib").alias("s"))
            )
            ranks = nodes.join(sums, "node", "left").select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct}L * coalesce(s, 0L)) div 100L")
                ).cast("long").alias("rank"),
            )
            if step % materialize_every == 0 and step < num_iters:
                nxt = ranks.persist()
                nxt.count()  # bound plan depth for large K
                if materialized is not None:
                    materialized.unpersist()
                materialized = nxt
                ranks = nxt
        out = ranks.persist()
        out.count()  # ONE materialization for the whole chain
        return out
    finally:
        adj.unpersist()
        nodes.unpersist()
        if materialized is not None:
            materialized.unpersist()


# ---- oracle twins --------------------------------------------------------

PR_ITERS = 6
PR_OUT_EDGES = 3  # synthetic out-degree per document node


def _pagerank_oracle(num_iters: int, n_docs: int) -> str:
    """DuckDB replay of the md5-derived document graph + the exact
    integer fixed point. Every CTE is MATERIALIZED: DuckDB inlines
    plain CTEs per reference, which would re-derive the chain
    exponentially (same fix as ml/bpe.py)."""
    scale, damp = SCALE, DAMPING_PCT
    sql = f"""
    WITH edges AS MATERIALIZED (
      SELECT doc_id AS src,
             CAST(concat('0x', substr(md5(doc_id::VARCHAR || '#' || j.j),
                                      1, 15)) AS BIGINT)
               % {n_docs} AS dst
      FROM documents, UNNEST(range(1, {PR_OUT_EDGES + 1})) AS j(j)
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    nstat AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    adj AS MATERIALIZED (
      SELECT src AS node, dst, count(*) OVER (PARTITION BY src) AS outdeg
      FROM edges
    ),
    r0 AS MATERIALIZED (
      SELECT node, {scale} // (SELECT n FROM nstat) AS rank FROM nodes
    )"""
    for k in range(1, num_iters + 1):
        p = k - 1
        sql += f""",
    s{k} AS MATERIALIZED (
      SELECT a.dst AS node, sum(r.rank // a.outdeg) AS s
      FROM adj a JOIN r{p} r USING (node)
      GROUP BY a.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node,
             CAST((100 - {damp}) * ({scale} // (SELECT n FROM nstat)) // 100
                  + {damp} * coalesce(s.s, 0) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN s{k} s USING (node)
    )"""
    sql += f"""
    SELECT node, rank FROM r{num_iters}
    """
    return sql


def _synthetic_edges(docs: DataFrame, n_docs: int) -> DataFrame:
    """Deterministic md5-derived citation graph over doc ids: each doc
    links to PR_OUT_EDGES pseudo-targets. Oracle-twin of the edges CTE
    above — the graph derivation is part of the checked contract."""
    return docs.select(
        F.col("doc_id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(PR_OUT_EDGES))).alias("j"),
    ).select(
        "src",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.encode(
                            F.concat(
                                F.col("src").cast("string"),
                                F.lit("#"),
                                F.col("j").cast("string"),
                            ),
                            "UTF-8",
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % n_docs
        ).alias("dst"),
    )


# ---- driver-contract queries ----------------------------------------------


def _register_pagerank() -> None:
    # the oracle needs the node-modulus constant; derive it from the
    # sf0.01 table the driver compares against (parquet footer, no scan).
    # Guarded: on a deployment without the local fixture tree (e.g. a
    # cluster run of readur_spark.zip) the registry must still import —
    # register the Spark query rows-only and skip the fixture-bound
    # oracle instead of failing every registered query at import time.
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = _pagerank_oracle(PR_ITERS, n_docs) if n_docs else None

    @register("host_pagerank", oracle=oracle)
    def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Integer fixed-point PageRank over a deterministic md5-derived
        document citation graph, value-hash-checked: the DuckDB twin
        replays the graph derivation AND all K damping iterations."""
        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        edges = _synthetic_edges(docs, n)
        return pagerank_fixed_point(edges, PR_ITERS).select("node", "rank")


_register_pagerank()


# ---- HITS (hubs & authorities) ---------------------------------------------

HITS_SCALE = 10**6  # L1 fixed-point grid: a_raw * SCALE stays in int64
HITS_ITERS = 4      # 2 shuffles + 2 scalar aggs per step; lazily chained


def hits_fixed_point(
    edges: DataFrame,
    num_iters: int = HITS_ITERS,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = HITS_SCALE,
) -> DataFrame:
    """K-iteration integer HITS (Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment"): authority(v) = Σ hub(u)
    over in-edges, hub(v) = Σ authority(w) over out-edges, each side
    L1-renormalized onto the fixed-point grid per iteration
    (x * scale div Σx — all-integer, so both engines replay the exact
    truncation). Parallel edge rows contribute once per occurrence,
    same stance as pagerank_fixed_point.

    Scale notes: the per-step sums are slim (node, value) frames; the
    normalizer is a 1-row aggregate joined back by broadcast. Unlike
    PageRank's damped update, each HITS step references its own
    intermediate TWICE (raw sums feed both the normalizer and the
    quotient), so the logical plan DOUBLES per step — persist caches
    data but not the plan, and analysis alone grows 4× per iteration
    (measured: 0.8 s → 100 s by step 8). Each side therefore
    localCheckpoints per step, truncating lineage to the cached
    blocks: 2K tiny materializations, flat per-step cost.
    int64 bound: Σ|h| ≈ scale after each renormalize, so
    a_raw ≤ E·scale and a_raw·scale ≤ E·10^12 — safe below ~10^6
    edges per connected run at this grid; widen the grid down (10^4)
    for larger graphs."""
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("authority"),
            F.lit(0).cast("long").alias("hub"),
        )
    e = edges.select(src.alias("e_src"), dst.alias("e_dst")).persist()
    h = nodes.select("node", F.lit(scale // n).cast("long").alias("v"))
    a = None
    def _step(frame: DataFrame, key, other) -> DataFrame:
        raw = (
            e.join(frame, e[key] == frame.node)
            .groupBy(e[other].alias("node"))
            .agg(F.sum("v").alias("raw"))
        )
        s = raw.agg(F.sum("raw").alias("s"))
        out = (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(s))
            .select(
                "node",
                F.expr(f"coalesce(raw, 0L) * {scale}L div s").alias("v"),
            )
            .localCheckpoint(eager=True)  # cut the lineage NOW — see docstring
        )
        return out

    for _ in range(num_iters):
        a = _step(h, "e_src", "e_dst")
        h = _step(a, "e_dst", "e_src")
    result = (
        a.withColumnRenamed("v", "authority")
        .join(h.withColumnRenamed("v", "hub"), "node")
        .select("node", "authority", "hub")
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    nodes.unpersist()
    return result


def _hits_oracle(num_iters: int, n_docs: int) -> str:
    """DuckDB replay: same md5 graph as the pagerank oracle, then the
    exact integer HITS recursion — every renormalization truncation
    included. CTEs MATERIALIZED for the same inlining reason."""
    scale = HITS_SCALE
    sql = f"""
    WITH edges AS MATERIALIZED (
      SELECT doc_id AS src,
             CAST(concat('0x', substr(md5(doc_id::VARCHAR || '#' || j.j),
                                      1, 15)) AS BIGINT)
               % {n_docs} AS dst
      FROM documents, UNNEST(range(1, {PR_OUT_EDGES + 1})) AS j(j)
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    nstat AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    h0 AS MATERIALIZED (
      SELECT node, {scale} // (SELECT n FROM nstat) AS v FROM nodes
    )"""
    for k in range(1, num_iters + 1):
        p = k - 1
        sql += f""",
    ar{k} AS MATERIALIZED (
      SELECT e.dst AS node, sum(h.v) AS raw
      FROM edges e JOIN h{p} h ON e.src = h.node GROUP BY e.dst
    ),
    sa{k} AS MATERIALIZED (SELECT sum(raw) AS s FROM ar{k}),
    a{k} AS MATERIALIZED (
      SELECT n.node,
             coalesce(ar.raw, 0) * {scale} // (SELECT s FROM sa{k}) AS v
      FROM nodes n LEFT JOIN ar{k} ar USING (node)
    ),
    hr{k} AS MATERIALIZED (
      SELECT e.src AS node, sum(a.v) AS raw
      FROM edges e JOIN a{k} a ON e.dst = a.node GROUP BY e.src
    ),
    sh{k} AS MATERIALIZED (SELECT sum(raw) AS s FROM hr{k}),
    h{k} AS MATERIALIZED (
      SELECT n.node,
             coalesce(hr.raw, 0) * {scale} // (SELECT s FROM sh{k}) AS v
      FROM nodes n LEFT JOIN hr{k} hr USING (node)
    )"""
    sql += f"""
    SELECT a.node, CAST(a.v AS BIGINT) AS authority,
           CAST(h.v AS BIGINT) AS hub
    FROM a{num_iters} a JOIN h{num_iters} h USING (node)
    """
    return sql


def _register_hits() -> None:
    # same lazy fixture guard as _register_pagerank: no fixture tree,
    # no oracle — but the registry must still import.
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = _hits_oracle(HITS_ITERS, n_docs) if n_docs else None

    @register("host_hits", oracle=oracle)
    def host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Integer HITS hubs/authorities over the md5-derived citation
        graph: graph derivation, both sum directions, and every
        renormalization truncation replayed value-for-value. The
        crawl-seeding complement of host_pagerank (authorities seed
        content crawls, hubs seed frontier discovery)."""
        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        edges = _synthetic_edges(docs, n)
        return hits_fixed_point(edges, HITS_ITERS)


_register_hits()


# ---- co-citation -----------------------------------------------------------

COCITE_MAX_OUTDEG = 64  # posting-join df cap: mega-hubs excluded


def cocitation_pairs(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_outdeg: int = COCITE_MAX_OUTDEG,
    min_cocites: int = 2,
) -> DataFrame:
    """(node_a, node_b, n_cocites): how many distinct sources link to
    BOTH targets (Small 1973 co-citation; the transpose — shared
    outlink targets between sources — is bibliographic coupling and is
    this same join with src/dst swapped). Co-cited host pairs are the
    classic mirror/affiliate signal a crawl uses to collapse
    equivalent sites before budgeting.

    Shape: the standard posting self-join with a frequency cap — the
    same quadratic-blowup defense as ml/dedup.py's jaccard_pairs:
    sources with out-degree > max_outdeg contribute no pairs (a
    mega-hub co-cites everything, carrying no signal and O(d²) rows),
    so per-source work is bounded by cap². Dedup to distinct
    (src,dst) first: parallel links must not inflate counts."""
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d")
    ).distinct()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    small = e.join(deg.where(F.col("outdeg") <= max_outdeg), "s")
    a = small.select("s", F.col("d").alias("node_a"))
    b = small.select("s", F.col("d").alias("node_b"))
    return (
        a.join(b, "s")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cocites"))
        .where(F.col("n_cocites") >= min_cocites)
    )


def _register_cocitation() -> None:
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = None
    if n_docs:
        oracle = f"""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT doc_id AS s,
                 CAST(concat('0x', substr(md5(doc_id::VARCHAR || '#' || j.j),
                                          1, 15)) AS BIGINT)
                   % {n_docs} AS d
          FROM documents, UNNEST(range(1, {PR_OUT_EDGES + 1})) AS j(j)
        ),
        deg AS (SELECT s, count(*) AS outdeg FROM edges GROUP BY s),
        small AS (
          SELECT e.s, e.d FROM edges e JOIN deg USING (s)
          WHERE deg.outdeg <= {COCITE_MAX_OUTDEG}
        )
        SELECT a.d AS node_a, b.d AS node_b,
               CAST(count(*) AS BIGINT) AS n_cocites
        FROM small a JOIN small b ON a.s = b.s AND a.d < b.d
        GROUP BY a.d, b.d
        HAVING count(*) >= 2
        """

    @register("graph_cocitation_pairs", oracle=oracle)
    def graph_cocitation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Co-citation pairs over the md5-derived citation graph —
        the dedup, the degree cap, the capped self-join, and the pair
        census all replayed by the DuckDB twin."""
        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        return cocitation_pairs(_synthetic_edges(docs, n))


_register_cocitation()


@register("host_link_graph")
def host_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level outlink edge list extracted from the synthetic raw
    HTML corpus (rows-only: href parsing is not SQL-expressible; the
    kernel is pinned byte-for-byte in tests/test_linkgraph.py)."""
    from readur_spark.corpus import synthetic_pages

    pages = synthetic_pages(spark, 500)
    return outlink_edges(pages).select("src_host", "dst_host", "n_links")


# ---- anchor text -----------------------------------------------------------

_ANCHOR_RE = re.compile(
    r"<a\s[^>]*?href\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))[^>]*>"
    r"(.*?)</a>",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_anchors(page_url: str, html: bytes | None) -> list[tuple[str, str]]:
    """(dst_host, anchor_text) per link: href resolution identical to
    `extract_outlink_hosts`; the anchor text is the tag's inner markup
    with nested tags stripped and whitespace normalized. Empty anchors
    (image links, spacer links) are dropped."""
    if not html:
        return []
    text = html.decode("utf-8", "replace")
    out: list[tuple[str, str]] = []
    for m in _ANCHOR_RE.finditer(text):
        href = next(g for g in m.groups()[:3] if g is not None).strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        try:
            parsed = urlparse(urljoin(page_url, href))
        except ValueError:
            continue
        if parsed.scheme not in ("http", "https") or not parsed.hostname:
            continue
        anchor = _WS_RE.sub(" ", _TAG_RE.sub(" ", m.group(4))).strip()
        if anchor:
            out.append((parsed.hostname.lower(), anchor))
    return out


def anchor_term_profile(pages: DataFrame) -> DataFrame:
    """(dst_host, term, n) — how the web DESCRIBES each host: lowercase
    alphabetic terms of every anchor pointing at it, counted. The
    classic off-page relevance signal (anchor text indexes the TARGET,
    not the source — Brin & Page 1998 §2.2). Payload crosses the
    Python boundary once; the emitted (host, term) stream is slim and
    aggregates map-side."""
    slim = pages.select("url", "html")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            hosts: list[str] = []
            texts: list[str] = []
            for url, html in zip(batch["url"], batch["html"]):
                for dst, anchor in extract_anchors(
                    url, bytes(html) if html is not None else None
                ):
                    hosts.append(dst)
                    texts.append(anchor)
            yield pd.DataFrame({"dst_host": hosts, "anchor": texts})

    anchors = slim.mapInPandas(run, schema="dst_host string, anchor string")
    terms = anchors.select(
        "dst_host",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("anchor")), "[^a-z]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("term"),
    )
    return terms.groupBy("dst_host", "term").agg(F.count("*").alias("n"))


@register("anchor_text_terms")
def anchor_text_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-term profile of every linked host in the synthetic raw
    HTML corpus (rows-only: anchor parsing is not SQL-expressible; the
    kernel is pinned on golden HTML in tests/test_linkgraph.py)."""
    from readur_spark.corpus import synthetic_pages

    pages = synthetic_pages(spark, 500)
    return anchor_term_profile(pages).select("dst_host", "term", "n")


# ---- constructed-corpus oracle for the href kernel ---------------------


def _linked_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real HTML pages from `documents` with a link structure both
    engines can derive: each page (host = source.example) links twice
    to hub<doc_id%10>.example (one absolute double-quoted, one
    single-quoted with a path), once to hub<(doc_id+3)%10>.example,
    once RELATIVELY to its own host (the urljoin path), plus one
    mailto: and one fragment link the kernel must ignore."""
    docs = load(spark, sf_dir, "documents")
    hub_a = F.concat(F.lit("hub"), (F.col("doc_id") % 10).cast("string"),
                     F.lit(".example"))
    hub_b = F.concat(F.lit("hub"), ((F.col("doc_id") + 3) % 10).cast("string"),
                     F.lit(".example"))
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example/doc"), F.col("doc_id").cast("string"),
                   F.lit(".html"))
    html = F.concat(
        F.lit('<html><body><a href="https://'), hub_a, F.lit('/">x</a>'),
        F.lit("<a href='http://"), hub_a, F.lit("/deep/page'>y</a>"),
        F.lit('<a href="https://'), hub_b, F.lit('/p">z</a>'),
        F.lit('<a href="/local.html">self</a>'),
        F.lit('<a href="mailto:a@b.c">m</a>'),
        F.lit('<a href="#frag">f</a>'),
        F.lit("</body></html>"),
    )
    return docs.select(
        url.alias("url"),
        F.encode(html, "utf-8").cast("binary").alias("html"),
    )


@register(
    "outlink_edges_parse",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             source || '.example' AS src_host,
             'hub' || CAST(doc_id % 10 AS VARCHAR) || '.example' AS hub_a,
             'hub' || CAST((doc_id + 3) % 10 AS VARCHAR) || '.example'
               AS hub_b
      FROM documents
    ),
    links AS (
      SELECT src_host, hub_a AS dst_host, 2 AS w FROM base
      UNION ALL
      SELECT src_host, hub_b, 1 FROM base
      UNION ALL
      SELECT src_host, src_host, 1 FROM base
    )
    SELECT src_host, dst_host, CAST(sum(w) AS BIGINT) AS n_links
    FROM links GROUP BY src_host, dst_host
    """,
)
def outlink_edges_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The href-extraction kernel value-hash-checked end-to-end: real
    constructed HTML (quote styles, absolute/relative targets, mailto
    and fragment noise) parsed by `extract_outlink_hosts`, with the
    DuckDB oracle re-deriving the (src, dst, n_links) edges from the
    same construction rule. Complements the rows-only
    `host_link_graph` (datagen corpus) by pinning the parser itself."""
    return outlink_edges(_linked_pages(spark, sf_dir)).select(
        "src_host", "dst_host", "n_links"
    )


def _anchored_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose anchor texts both engines can derive: each page
    links to hub<doc_id%10>.example with anchor text built from the
    doc's lang plus nested markup and irregular whitespace the kernel
    must strip ('read <b>the LANG guide</b>  now'), and once more
    with an empty (image) anchor that must be dropped."""
    docs = load(spark, sf_dir, "documents")
    hub = F.concat(F.lit("hub"), (F.col("doc_id") % 10).cast("string"),
                   F.lit(".example"))
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example/doc"), F.col("doc_id").cast("string"),
                   F.lit(".html"))
    html = F.concat(
        F.lit('<html><body><a href="https://'), hub,
        F.lit('/g">read <b>the '), F.col("lang"),
        F.lit(" guide</b>\n  now</a>"),
        F.lit('<a href="https://'), hub,
        F.lit('/i"><img src="x.png"></a>'),
        F.lit("</body></html>"),
    )
    return docs.select(
        url.alias("url"),
        F.encode(html, "utf-8").cast("binary").alias("html"),
    )


@register(
    "anchor_terms_parse",
    oracle="""
    WITH base AS (
      SELECT 'hub' || CAST(doc_id % 10 AS VARCHAR) || '.example'
               AS dst_host,
             lang
      FROM documents
    ),
    terms AS (
      SELECT dst_host, t.term
      FROM base,
           UNNEST(['read', 'the', lower(lang), 'guide', 'now'])
             AS t(term)
    )
    SELECT dst_host, term, count(*) AS n
    FROM terms GROUP BY dst_host, term
    """,
)
def anchor_terms_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anchor-text kernel value-hash-checked end-to-end: nested
    tags stripped, whitespace normalized, empty image anchors dropped
    — the oracle re-derives every (host, term, n) from the
    construction rule."""
    return anchor_term_profile(_anchored_pages(spark, sf_dir)).select(
        "dst_host", "term", "n"
    )


# ---- reciprocity (link-farm signal) -----------------------------------------


def reciprocity_stats(
    edges: DataFrame, *, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, outdeg, n_reciprocal, recip_pct): what fraction of a
    node's distinct outlinks point straight back (Fetterly et al.,
    "Spam, damn spam, and statistics", WebDB 2004 — excessive
    reciprocity marks link farms and mutual-admiration rings that
    inflate citation ranks). Integer percent, floor division.

    Shape: dedup to distinct pairs, self-join on the REVERSED pair
    (equi-join on both keys — hash join, no inequality blowup), two
    map-side-combinable aggregates. Self-loops are excluded: a page
    linking itself is not reciprocity."""
    e = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .where(F.col(src_col) != F.col(dst_col))
        .distinct()
    )
    rev = e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    recip = (
        e.intersect(rev)
        .groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_reciprocal"))
    )
    deg = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )
    return deg.join(recip, "node", "left").select(
        "node",
        "outdeg",
        F.coalesce("n_reciprocal", F.lit(0)).cast("long").alias(
            "n_reciprocal"
        ),
        F.expr("100L * coalesce(n_reciprocal, 0L) div outdeg").alias(
            "recip_pct"
        ),
    )


def _register_reciprocity() -> None:
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = None
    if n_docs:
        oracle = f"""
        WITH e AS MATERIALIZED (
          SELECT DISTINCT doc_id AS s,
                 CAST(concat('0x', substr(md5(doc_id::VARCHAR || '#' || j.j),
                                          1, 15)) AS BIGINT)
                   % {n_docs} AS d
          FROM documents, UNNEST(range(1, {PR_OUT_EDGES + 1})) AS j(j)
          WHERE doc_id <> CAST(concat('0x',
                   substr(md5(doc_id::VARCHAR || '#' || j.j), 1, 15))
                   AS BIGINT) % {n_docs}
        ),
        recip AS (
          SELECT e.s AS node, count(*) AS n_reciprocal
          FROM e JOIN e r ON e.s = r.d AND e.d = r.s
          GROUP BY e.s
        ),
        deg AS (SELECT s AS node, count(*) AS outdeg FROM e GROUP BY s)
        SELECT deg.node, CAST(deg.outdeg AS BIGINT) AS outdeg,
               CAST(coalesce(recip.n_reciprocal, 0) AS BIGINT)
                 AS n_reciprocal,
               100 * coalesce(recip.n_reciprocal, 0) // deg.outdeg
                 AS recip_pct
        FROM deg LEFT JOIN recip USING (node)
        """

    @register("graph_reciprocity", oracle=oracle)
    def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-node reciprocal-link fraction over the md5 citation
        graph — dedup, the reversed-pair equi-join, and the integer
        percentages replayed in DuckDB."""
        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        return reciprocity_stats(_synthetic_edges(docs, n))


_register_reciprocity()


# ---- TrustRank (seed-biased PageRank) ---------------------------------------

TR_ITERS = 6
TR_SEED_MOD = 17  # deterministic demo seed rule: node % 17 == 0


def trustrank_fixed_point(
    edges: DataFrame,
    seeds: DataFrame,
    num_iters: int = TR_ITERS,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping_pct: int = DAMPING_PCT,
    scale: int = SCALE,
    materialize_every: int = 8,
) -> DataFrame:
    """Integer TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB
    2004, "Combating web spam with TrustRank"): PageRank whose
    teleport mass flows ONLY to a trusted seed set — trust decays
    along links, so spam hosts far from any seed end near zero even
    with heavy in-link counts. Same exact-integer update as
    pagerank_fixed_point, with base(v) and the initial rank nonzero
    only for seeds (mass divided by |S|, not N). `seeds` is a 1-column
    (node) frame; it broadcasts onto the node table once. Iterations
    chain lazily — no per-step scalar, so the PageRank plan-depth
    argument carries over unchanged."""
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
        .join(
            F.broadcast(
                seeds.select(F.col("node"), F.lit(True).alias("is_seed"))
            ),
            "node",
            "left",
        )
        .select("node", F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
        .persist()
    )
    n_seeds = nodes.where("is_seed").count()
    if n_seeds == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    seed_base = ((100 - damping_pct) * (scale // n_seeds)) // 100
    base = F.when(F.col("is_seed"), F.lit(seed_base)).otherwise(F.lit(0))
    deg = edges.groupBy(src.alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    adj = (
        edges.select(src.alias("node"), dst.alias("dst"))
        .join(deg, "node")
        .repartition("node")
        .persist()
    )
    ranks = nodes.select(
        "node",
        F.when(F.col("is_seed"), F.lit(scale // n_seeds))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rank"),
    )
    materialized: DataFrame | None = None
    for step in range(1, num_iters + 1):
        sums = (
            adj.join(ranks, "node")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                base
                + F.expr(f"({damping_pct}L * coalesce(s, 0L)) div 100L")
            ).cast("long").alias("rank"),
        )
        if step % materialize_every == 0 and step < num_iters:
            nxt = ranks.persist()
            nxt.count()
            if materialized is not None:
                materialized.unpersist()
            materialized = nxt
            ranks = nxt
    return ranks


def _trustrank_oracle(num_iters: int, n_docs: int) -> str:
    scale, damp, mod = SCALE, DAMPING_PCT, TR_SEED_MOD
    sql = f"""
    WITH edges AS MATERIALIZED (
      SELECT doc_id AS src,
             CAST(concat('0x', substr(md5(doc_id::VARCHAR || '#' || j.j),
                                      1, 15)) AS BIGINT)
               % {n_docs} AS dst
      FROM documents, UNNEST(range(1, {PR_OUT_EDGES + 1})) AS j(j)
    ),
    nodes AS MATERIALIZED (
      SELECT node, node % {mod} = 0 AS is_seed FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
      )
    ),
    sstat AS MATERIALIZED (
      SELECT count(*) AS ns FROM nodes WHERE is_seed
    ),
    adj AS MATERIALIZED (
      SELECT src AS node, dst, count(*) OVER (PARTITION BY src) AS outdeg
      FROM edges
    ),
    r0 AS MATERIALIZED (
      SELECT node,
             CASE WHEN is_seed
                  THEN {scale} // (SELECT ns FROM sstat) ELSE 0 END AS rank
      FROM nodes
    )"""
    for k in range(1, num_iters + 1):
        p = k - 1
        sql += f""",
    s{k} AS MATERIALIZED (
      SELECT a.dst AS node, sum(r.rank // a.outdeg) AS s
      FROM adj a JOIN r{p} r USING (node)
      GROUP BY a.dst
    ),
    r{k} AS MATERIALIZED (
      SELECT n.node,
             CAST(CASE WHEN n.is_seed
                  THEN (100 - {damp})
                       * ({scale} // (SELECT ns FROM sstat)) // 100
                  ELSE 0 END
                  + {damp} * coalesce(s.s, 0) // 100 AS BIGINT) AS rank
      FROM nodes n LEFT JOIN s{k} s USING (node)
    )"""
    sql += f"""
    SELECT node, rank FROM r{num_iters}
    """
    return sql


def _register_trustrank() -> None:
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = _trustrank_oracle(TR_ITERS, n_docs) if n_docs else None

    @register("host_trustrank", oracle=oracle)
    def host_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Integer TrustRank over the md5 citation graph with the
        deterministic node%17 seed set — seeding, the biased teleport,
        and all damping iterations replayed value-for-value."""
        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        edges = _synthetic_edges(docs, n)
        nodes = edges.select(F.col("src").alias("node")).union(
            edges.select(F.col("dst").alias("node"))
        ).distinct()
        seeds = nodes.where(F.col("node") % TR_SEED_MOD == 0)
        return trustrank_fixed_point(edges, seeds, TR_ITERS)


_register_trustrank()


# ---- spam mass (PageRank vs TrustRank composition) --------------------------


def spam_mass(pr: DataFrame, tr: DataFrame) -> DataFrame:
    """Relative spam mass (Gyöngyi, Berkhin, Garcia-Molina & Pedersen
    2006, "Link spam detection based on mass estimation"): the share
    of a node's PageRank NOT backed by trust —
    permille((pr - tr) / pr), clipped at 0. Both ranks inject the same
    damped teleport mass total (0.15·scale per round), so the integer
    ratio is directly comparable; a high-PR node with near-zero
    TrustRank is the canonical link-spam shape. Pure projection over
    the two slim rank frames."""
    return (
        pr.select("node", F.col("rank").alias("pr"))
        .join(tr.select("node", F.col("rank").alias("tr")), "node")
        .select(
            "node",
            "pr",
            "tr",
            F.when(
                F.col("pr") > 0,
                F.greatest(
                    F.lit(0).cast("long"),
                    F.expr("(1000L * (pr - tr)) div pr"),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("spam_mass_permille"),
        )
    )


def _prefixed_chain(prefix: str, body: str) -> str:
    """Rename every CTE of a rank oracle chain with a prefix so two
    chains can share one WITH clause (both generators emit the same
    names)."""
    import re as _re

    names = set(_re.findall(r"([a-z]+\d*) AS MATERIALIZED", body))
    out = body
    for n in sorted(names, key=len, reverse=True):
        out = _re.sub(rf"\b{n}\b", f"{prefix}{n}", out)
    return out


def _spam_mass_oracle(num_iters: int, n_docs: int) -> str:
    pr_chain = _pagerank_oracle(num_iters, n_docs)
    tr_chain = _trustrank_oracle(num_iters, n_docs)
    # strip each chain to its CTE list + remember its final select
    pr_ctes = _prefixed_chain(
        "pr_", pr_chain[pr_chain.index("WITH") + 4 : pr_chain.rindex("SELECT")]
    )
    tr_ctes = _prefixed_chain(
        "tr_", tr_chain[tr_chain.index("WITH") + 4 : tr_chain.rindex("SELECT")]
    )
    return f"""
    WITH {pr_ctes.strip().rstrip(',')},
    {tr_ctes.strip().rstrip(',')}
    SELECT p.node, p.rank AS pr, t.rank AS tr,
           CAST(CASE WHEN p.rank > 0
                THEN greatest(0, (1000 * (p.rank - t.rank)) // p.rank)
                ELSE 0 END AS BIGINT) AS spam_mass_permille
    FROM pr_r{num_iters} p JOIN tr_r{num_iters} t USING (node)
    """


def _register_spam_mass() -> None:
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = _spam_mass_oracle(PR_ITERS, n_docs) if n_docs else None

    @register("host_spam_mass", oracle=oracle)
    def host_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Spam mass over the md5 citation graph: BOTH fixed points —
        PageRank and the node%17-seeded TrustRank — replayed in one
        oracle, then the clipped permille ratio value-hashed. A wrong
        iteration anywhere in either chain moves the composition."""
        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        edges = _synthetic_edges(docs, n)
        pr = pagerank_fixed_point(edges, PR_ITERS)
        nodes = edges.select(F.col("src").alias("node")).union(
            edges.select(F.col("dst").alias("node"))
        ).distinct()
        seeds = nodes.where(F.col("node") % TR_SEED_MOD == 0)
        tr = trustrank_fixed_point(edges, seeds, PR_ITERS)
        return spam_mass(pr, tr)


_register_spam_mass()


# ---- anchor-text retrieval pairs (weak supervision, r5s11) -----------------

ANCHOR_TOPK = 3


def anchor_query_pairs(profile: DataFrame) -> DataFrame:
    """(dst_host, term, n, df_hosts, idf_bits, weight, rank) — weak-
    supervision retrieval pairs mined from anchor text (the published
    recipe: anchor text approximates the queries that retrieve the
    target page; e.g. Zhang et al. 2020 use anchor-document pairs to
    pretrain dense retrievers). From the (dst_host, term, n) anchor
    profile:

      df_hosts  = distinct hosts whose inlinks carry the term
      idf_bits  = floor(log2(N_hosts div df_hosts))   (int_log2 idiom)
      weight    = n · idf_bits  — corpus-wide terms ('read', 'the')
                  get idf 0 and drop out of the ranking signal
      rank      = per-host order by (weight desc, term asc), top-K kept

    Scale: the profile frame is |hosts|·|terms| (slim); df is one
    grouped count over it; the window partitions by host. No payload."""
    df_hosts = profile.groupBy("term").agg(
        F.countDistinct("dst_host").cast("long").alias("df_hosts")
    )
    n_hosts = profile.select("dst_host").distinct().count()
    scored = profile.join(F.broadcast(df_hosts), "term").select(
        "dst_host",
        "term",
        "n",
        "df_hosts",
        F.expr(
            f"length(bin({n_hosts}L div df_hosts)) - 1"
        ).cast("long").alias("idf_bits"),
    ).withColumn("weight", F.expr("n * idf_bits"))
    w = Window.partitionBy("dst_host").orderBy(
        F.desc("weight"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANCHOR_TOPK)
    )


@register(
    "anchor_query_pairs",
    oracle=f"""
    WITH base AS (
      SELECT 'hub-' || lang || '-' || CAST(doc_id % 3 AS VARCHAR)
               || '.example' AS dst_host,
             lang
      FROM documents
    ),
    terms AS (
      SELECT dst_host, t.term
      FROM base,
           UNNEST(['read', 'the', lower(lang), 'guide', 'now'])
             AS t(term)
    ),
    profile AS (
      SELECT dst_host, term, count(*) AS n
      FROM terms GROUP BY dst_host, term
    ),
    dfh AS (
      SELECT term, CAST(count(DISTINCT dst_host) AS BIGINT) AS df_hosts
      FROM profile GROUP BY term
    ),
    nh AS (SELECT count(DISTINCT dst_host) AS n_hosts FROM profile),
    scored AS (
      SELECT p.dst_host, p.term, p.n, d.df_hosts,
             CAST(length(bin((SELECT n_hosts FROM nh) // d.df_hosts)) - 1
                  AS BIGINT) AS idf_bits
      FROM profile p JOIN dfh d USING (term)
    ),
    ranked AS (
      SELECT *, n * idf_bits AS weight,
             row_number() OVER (PARTITION BY dst_host
                                ORDER BY n * idf_bits DESC, term ASC)
               AS rank
      FROM scored
    )
    SELECT dst_host, term, n, df_hosts, idf_bits, weight,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {ANCHOR_TOPK}
    """,
)
def anchor_query_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-mined retrieval pairs value-hashed end-to-end: the REAL
    anchor kernel parses constructed pages whose hubs are LANGUAGE-
    PARTITIONED (hub-{lang}-{doc_id%3}: a language's anchor term
    reaches only its own 3 hubs, so idf separates it from the
    corpus-wide 'read the … guide now' filler), and the oracle
    re-derives the profile from the construction rule, then replays
    df, int-log2 idf, weights, and the per-host top-K ranking —
    each hub's rank-1 pair is its language term, the mined "query"."""
    profile = anchor_term_profile(
        _lang_anchored_pages(spark, sf_dir)
    ).select("dst_host", "term", "n")
    out = anchor_query_pairs(profile)
    return out.select(
        "dst_host", "term", "n", "df_hosts", "idf_bits", "weight",
        F.col("rank").cast("int").alias("rank"),
    )


def _lang_anchored_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`_anchored_pages` with language-partitioned hubs: page doc_id
    links to hub-{lang}-{doc_id%3}.example with the same nested-markup
    anchor text ('read <b>the LANG guide</b>  now') plus the empty
    image anchor the kernel must drop."""
    docs = load(spark, sf_dir, "documents")
    hub = F.concat(
        F.lit("hub-"), F.col("lang"), F.lit("-"),
        (F.col("doc_id") % 3).cast("string"), F.lit(".example"),
    )
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example/doc"), F.col("doc_id").cast("string"),
                   F.lit(".html"))
    html = F.concat(
        F.lit('<html><body><a href="https://'), hub,
        F.lit('/g">read <b>the '), F.col("lang"),
        F.lit(" guide</b>\n  now</a>"),
        F.lit('<a href="https://'), hub,
        F.lit('/i"><img src="x.png"></a>'),
        F.lit("</body></html>"),
    )
    return docs.select(
        url.alias("url"),
        F.encode(html, "utf-8").cast("binary").alias("html"),
    )
