"""OPIC — On-line Page Importance Computation, exact-integer batch form.

Crawl frontiers need an importance signal CHEAPER than converged
PageRank: OPIC (Abiteboul, Preda & Cobena, "Adaptive On-Line Page
Importance Computation", WWW 2003) gives every page a unit of CASH;
a visited page distributes its cash equally over its outlinks and
logs the amount in its HISTORY, and a page's importance estimate is
history + cash — no damping, no convergence wait, and the estimate
improves monotonically as the crawl proceeds. Heritrix and Nutch
descendants use exactly this shape for frontier prioritization.

Batch re-expression (one synchronous sweep per step, the module's
checkable form) in EXACT integers, cash conserved to the unit:

    share    = cash div outdeg            (per out-edge)
    retained = cash mod outdeg            (the indivisible remainder
                                           stays on the page — no
                                           cash is ever minted or
                                           destroyed, so sum(cash)
                                           is invariant and the
                                           oracle can assert it)
    sinks (no outlinks) retain everything (OPIC's virtual-page edge
    case, resolved toward conservation);
    hist    += cash - retained
    cash'    = retained + sum(incoming shares)
    importance = hist + cash   (the paper's estimator, unnormalized)

Scale design (10^12 pages): identical plan family to
ml/linkgraph.py's PageRank — the per-step state is a slim
(node, cash, hist) frame, the adjacency (with out-degree riding on
the edge rows) is partitioned once and reused every step, iterations
chain lazily with periodic materialization, and each step is one
co-partitioned join + one map-side-combinable sum. OPIC's practical
edge over PageRank at crawl time: a NEW page enters with its cash
only — no global re-normalization — so the frontier can re-rank
incrementally between sweeps.

Reference tie-in: the reference's work queue orders by a static
priority prefix (SURVEY §2 B21); this is the adaptive importance
signal a web-scale frontier replaces it with, alongside
ml/linkgraph.py's converged ranks.

The driver query runs K sweeps over the same deterministic
md5-derived citation graph as host_pagerank (ml/linkgraph.py
_synthetic_edges — the derivation is part of the checked contract);
the DuckDB twin replays every sweep, remainder for remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load, table_row_count

OPIC_ITERS = 6
OPIC_TOTAL = 10_000_000  # total cash in circulation (integer units)


def opic_sweeps(
    edges: DataFrame,
    num_iters: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    total: int = OPIC_TOTAL,
    init_state: DataFrame | None = None,
) -> DataFrame:
    """K synchronous OPIC sweeps over an edge list. Returns
    (node, cash, hist, importance) in exact integer cash units;
    sum(cash) == the initial allocation, invariantly.

    `init_state` (node, cash, hist) resumes from carried state — the
    incremental-crawl entry point: new pages arrive with their fresh
    cash rows unioned in, old pages keep theirs, nothing
    renormalizes. The caller's state must cover every edge endpoint
    (the node set IS the state's)."""
    src, dst = F.col(src_col), F.col(dst_col)
    if init_state is None:
        nodes = (
            edges.select(src.alias("node"))
            .union(edges.select(dst.alias("node")))
            .distinct()
        )
        n = nodes.count()
        if n == 0:
            return nodes.select(
                "node",
                F.lit(0).cast("long").alias("cash"),
                F.lit(0).cast("long").alias("hist"),
                F.lit(0).cast("long").alias("importance"),
            )
        nodes = nodes.persist()
        state = nodes.select(
            "node",
            F.lit(total // n).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
        )
    else:
        nodes = init_state.select("node").persist()
        state = init_state.select("node", "cash", "hist")
    # deg is consumed EVERY sweep by the state update — persist it, or
    # each of the K steps re-scans the edge list for the same counts
    # (measured at sf0.1: 23 s -> ~6 s for the 6-sweep driver query)
    deg = edges.groupBy(src.alias("node")).agg(
        F.count("*").cast("long").alias("outdeg")
    ).persist()
    adj = (
        edges.select(src.alias("node"), dst.alias("dst"))
        .join(deg, "node")
        .repartition("node")
        .persist()
    )
    try:
        for step in range(1, num_iters + 1):
            inflow = (
                adj.join(state.select("node", "cash"), "node")
                .select(
                    F.col("dst").alias("node"),
                    F.expr("cash div outdeg").alias("share"),
                )
                .groupBy("node")
                .agg(F.sum("share").alias("inflow"))
            )
            state = (
                state.join(deg, "node", "left")
                .join(inflow, "node", "left")
                .select(
                    "node",
                    F.expr(
                        "CASE WHEN outdeg IS NULL THEN cash"
                        " ELSE cash % outdeg END"
                        " + coalesce(inflow, 0L)"
                    ).cast("long").alias("cash"),
                    F.expr(
                        "hist + CASE WHEN outdeg IS NULL THEN 0L"
                        " ELSE cash - cash % outdeg END"
                    ).cast("long").alias("hist"),
                )
            )
            # UNLIKE PageRank's linear lineage (each rank frame is
            # referenced once), the OPIC update references state TWICE
            # — directly and through inflow — so an unmaterialized
            # chain doubles the plan per sweep (2^K analysis blowup;
            # measured 35 s for 6 sweeps on a 5k-node graph). The
            # per-sweep localCheckpoint of the slim (node, cash, hist)
            # frame is the Pregel-superstep cost, ~0.3 s/step here.
            if step < num_iters:
                state = state.localCheckpoint(eager=True)
        out = state.select(
            "node", "cash", "hist",
            (F.col("cash") + F.col("hist")).cast("long").alias("importance"),
        ).persist()
        out.count()
        return out
    finally:
        adj.unpersist()
        deg.unpersist()
        nodes.unpersist()


# ---- oracle twin -----------------------------------------------------------


def _opic_oracle(num_iters: int, n_docs: int) -> str:
    """DuckDB replay of the md5 graph + every sweep. MATERIALIZED CTEs
    for the same inlining reason as the PageRank oracle."""
    from readur_spark.ml.linkgraph import PR_OUT_EDGES

    total = OPIC_TOTAL
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
    deg AS MATERIALIZED (
      SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src
    ),
    st0 AS MATERIALIZED (
      SELECT node, {total} // (SELECT n FROM nstat) AS cash, 0 AS hist
      FROM nodes
    )"""
    for k in range(1, num_iters + 1):
        p = k - 1
        sql += f""",
    in{k} AS MATERIALIZED (
      SELECT e.dst AS node, sum(s.cash // d.outdeg) AS inflow
      FROM edges e JOIN deg d ON e.src = d.node
      JOIN st{p} s ON e.src = s.node
      GROUP BY e.dst
    ),
    st{k} AS MATERIALIZED (
      SELECT s.node,
             CASE WHEN d.outdeg IS NULL THEN s.cash
                  ELSE s.cash % d.outdeg END
               + coalesce(i.inflow, 0) AS cash,
             s.hist + CASE WHEN d.outdeg IS NULL THEN 0
                           ELSE s.cash - s.cash % d.outdeg END AS hist
      FROM st{p} s LEFT JOIN deg d USING (node)
      LEFT JOIN in{k} i USING (node)
    )"""
    sql += f"""
    SELECT node, CAST(cash AS BIGINT) AS cash, CAST(hist AS BIGINT) AS hist,
           CAST(cash + hist AS BIGINT) AS importance
    FROM st{num_iters}
    """
    return sql


def _register_opic() -> None:
    # same fixture guard as linkgraph._register_pagerank: no local
    # fixture tree -> register rows-only instead of failing the import.
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = _opic_oracle(OPIC_ITERS, n_docs) if n_docs else None

    @register("opic_importance", oracle=oracle)
    def opic_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
        """K OPIC sweeps over the md5-derived citation graph — cash
        shares, retained remainders, sink policy, histories, and the
        importance estimator all replayed sweep-for-sweep by DuckDB."""
        from readur_spark.ml.linkgraph import _synthetic_edges

        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        edges = _synthetic_edges(docs, n)
        return opic_sweeps(edges, OPIC_ITERS)


_register_opic()


# ---- incremental crawl segment (module-docstring claim, checked) -----------

OPIC_BASE_ITERS = 4
OPIC_DELTA_ITERS = 2


def _opic_incremental_oracle(n_docs: int) -> str:
    """DuckDB replay: K1 sweeps on the base graph, the delta segment
    unioned in with fresh per-page cash, K2 more sweeps on the full
    graph — remainder for remainder."""
    from readur_spark.ml.linkgraph import PR_OUT_EDGES

    total = OPIC_TOTAL
    sql = f"""
    WITH eb AS MATERIALIZED (
      SELECT doc_id AS src,
             CAST(concat('0x', substr(md5(doc_id::VARCHAR || '#' || j.j),
                                      1, 15)) AS BIGINT)
               % {n_docs} AS dst
      FROM documents, UNNEST(range(1, {PR_OUT_EDGES + 1})) AS j(j)
    ),
    nb AS MATERIALIZED (
      SELECT src AS node FROM eb UNION SELECT dst FROM eb
    ),
    nbs AS MATERIALIZED (SELECT count(*) AS n FROM nb),
    degb AS MATERIALIZED (
      SELECT src AS node, count(*) AS outdeg FROM eb GROUP BY src
    ),
    st0 AS MATERIALIZED (
      SELECT node, {total} // (SELECT n FROM nbs) AS cash, 0 AS hist
      FROM nb
    )"""
    for k in range(1, OPIC_BASE_ITERS + 1):
        p = k - 1
        sql += f""",
    in{k} AS MATERIALIZED (
      SELECT e.dst AS node, sum(s.cash // d.outdeg) AS inflow
      FROM eb e JOIN degb d ON e.src = d.node
      JOIN st{p} s ON e.src = s.node
      GROUP BY e.dst
    ),
    st{k} AS MATERIALIZED (
      SELECT s.node,
             CASE WHEN d.outdeg IS NULL THEN s.cash
                  ELSE s.cash % d.outdeg END
               + coalesce(i.inflow, 0) AS cash,
             s.hist + CASE WHEN d.outdeg IS NULL THEN 0
                           ELSE s.cash - s.cash % d.outdeg END AS hist
      FROM st{p} s LEFT JOIN degb d USING (node)
      LEFT JOIN in{k} i USING (node)
    )"""
    sql += f""",
    ed AS MATERIALIZED (
      SELECT doc_id + {n_docs} AS src,
             CAST(concat('0x', substr(md5((doc_id + {n_docs})::VARCHAR
                                          || '#' || j.j), 1, 15)) AS BIGINT)
               % {n_docs} AS dst
      FROM documents, UNNEST(range(1, {PR_OUT_EDGES + 1})) AS j(j)
      WHERE doc_id % 5 = 0
    ),
    ef AS MATERIALIZED (SELECT * FROM eb UNION ALL SELECT * FROM ed),
    degf AS MATERIALIZED (
      SELECT src AS node, count(*) AS outdeg FROM ef GROUP BY src
    ),
    sx0 AS MATERIALIZED (
      SELECT node, cash, hist FROM st{OPIC_BASE_ITERS}
      UNION ALL
      SELECT DISTINCT src AS node, {total} // (SELECT n FROM nbs) AS cash,
             0 AS hist
      FROM ed
    )"""
    for k in range(1, OPIC_DELTA_ITERS + 1):
        p = k - 1
        sql += f""",
    inx{k} AS MATERIALIZED (
      SELECT e.dst AS node, sum(s.cash // d.outdeg) AS inflow
      FROM ef e JOIN degf d ON e.src = d.node
      JOIN sx{p} s ON e.src = s.node
      GROUP BY e.dst
    ),
    sx{k} AS MATERIALIZED (
      SELECT s.node,
             CASE WHEN d.outdeg IS NULL THEN s.cash
                  ELSE s.cash % d.outdeg END
               + coalesce(i.inflow, 0) AS cash,
             s.hist + CASE WHEN d.outdeg IS NULL THEN 0
                           ELSE s.cash - s.cash % d.outdeg END AS hist
      FROM sx{p} s LEFT JOIN degf d USING (node)
      LEFT JOIN inx{k} i USING (node)
    )"""
    sql += f"""
    SELECT node, CAST(cash AS BIGINT) AS cash, CAST(hist AS BIGINT) AS hist,
           CAST(cash + hist AS BIGINT) AS importance,
           node >= {n_docs} AS is_new
    FROM sx{OPIC_DELTA_ITERS}
    """
    return sql


def _register_opic_incremental() -> None:
    try:
        n_docs = table_row_count("/root/testdata/sf0.01", "documents")
    except Exception:
        n_docs = None
    oracle = _opic_incremental_oracle(n_docs) if n_docs else None

    @register("opic_incremental", oracle=oracle)
    def opic_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The incremental-crawl shape OPIC exists for: K1 sweeps over
        the base citation graph, then a new crawl segment (shifted-id
        twins of every doc_id % 5 == 0 page, linking back into the
        base space) enters with its fresh per-page cash rows UNIONED
        into the carried state — no renormalization of anything
        already ranked — and K2 further sweeps fold it in. Both
        phases, the segment endowment, and the final estimator are
        replayed sweep-for-sweep by DuckDB."""
        from readur_spark.ml.linkgraph import _synthetic_edges

        docs = load(spark, sf_dir, "documents")
        n = table_row_count(sf_dir, "documents")
        base_edges = _synthetic_edges(docs, n)
        st = opic_sweeps(base_edges, OPIC_BASE_ITERS)

        delta_docs = docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + n).alias("doc_id")
        )
        delta_edges = _synthetic_edges(delta_docs, n)
        endowment = delta_edges.select("src").distinct().select(
            F.col("src").alias("node"),
            F.lit(OPIC_TOTAL // n).cast("long").alias("cash"),
            F.lit(0).cast("long").alias("hist"),
        )
        carried = st.select("node", "cash", "hist").unionByName(endowment)
        out = opic_sweeps(
            base_edges.unionByName(delta_edges),
            OPIC_DELTA_ITERS,
            init_state=carried,
        )
        return out.withColumn("is_new", F.col("node") >= n)


_register_opic_incremental()
