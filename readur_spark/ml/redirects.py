"""Redirect-chain resolution by pointer doubling.

A crawl frontier is full of 3xx hops: u -> v -> w chains (and the
occasional loop) that must collapse to their terminal target before
dedup, canonical collapse, or PageRank sees the urls — otherwise one
page is counted under every alias on its chain. The mapping is a
FUNCTIONAL graph (each source has exactly one target), so the right
distributed algorithm is pointer doubling / path halving (the classic
parallel list-ranking technique, Wyllie '79; the same trick inside
shortcutting CC algorithms): each round composes the mapping with
itself, so a chain of depth d resolves in ceil(log2 d) self-joins —
O(log d) SHUFFLES, not O(d) like naive step-at-a-time chasing. Hop
counts ride along additively (hops(u->w) = hops(u->v) + hops(v->w)),
so the output carries exact chain lengths.

Cycles (u <-> v) never reach a terminal; after the round budget their
cur pointer still has outgoing edges and they are flagged
resolved = false with final_url NULL — the crawl-ops "redirect loop"
bucket.

The DuckDB oracle replays the SAME doubled rounds as chained CTEs
(m1 = m0 compose m0, ...), not a recursive query — every intermediate
pointer and hop count is value-identical by construction.

Scale design (10^12 edges): state rows are slim (two urls + a long);
every round is one equi-join keyed by the current pointer; rounds are
persisted/truncated exactly like ml/linkgraph.py's PageRank loop. The
round budget is data-independent (log2 of the max chain the policy
tolerates — real crawlers cap redirect chains at 5-10 hops, so 3-4
rounds always suffice).

Reference tie-in: the reference follows redirects inside its HTTP
fetch (source sync paths in src/services/); this is the corpus-scale
relational form of the same collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import SYNTH_URL_SQL as _URL_SQL
from readur_spark.queries.tables import load, synthetic_url

ROUNDS = 3  # resolves chains up to 2^3 = 8 hops


def resolve_redirects(edges: DataFrame, rounds: int = ROUNDS) -> DataFrame:
    """Collapse a functional (src_url, dst_url) redirect mapping.

    Returns one row per redirect SOURCE: (src_url, final_url, hops,
    resolved). `resolved` is false (final_url = '' — an empty-string
    sentinel, not NULL, so downstream sorts/joins and the driver's
    row-sort compare never meet a None) when the chain still points at
    another redirect after `rounds` doublings — a loop or an over-long
    chain, indistinguishable by policy and handled the same way."""
    state = edges.select(
        "src_url", F.col("dst_url").alias("cur"), F.lit(1).alias("hops")
    ).persist()
    state.count()
    try:
        for _ in range(rounds):
            hop = state.select(
                F.col("src_url").alias("cur"),
                F.col("cur").alias("nxt"),
                F.col("hops").alias("h2"),
            )
            new = (
                state.join(hop, "cur", "left")
                .select(
                    "src_url",
                    F.coalesce(F.col("nxt"), F.col("cur")).alias("cur"),
                    (
                        F.col("hops")
                        + F.coalesce(F.col("h2"), F.lit(0))
                    ).alias("hops"),
                )
                .persist()
            )
            new.count()
            state.unpersist()
            state = new
        srcs = edges.select(F.col("src_url").alias("cur")).distinct()
        out = (
            state.join(
                srcs.withColumn("_is_redirect", F.lit(True)), "cur", "left"
            )
            .select(
                "src_url",
                F.when(F.col("_is_redirect").isNull(), F.col("cur"))
                .otherwise(F.lit(""))
                .alias("final_url"),
                F.col("hops").cast("long").alias("hops"),
                F.col("_is_redirect").isNull().alias("resolved"),
            )
        )
        # materialize before unpersisting the backing frame
        return out.localCheckpoint(eager=True)
    finally:
        state.unpersist()


# ---- constructed-corpus driver query --------------------------------------

# Construction rule (SQL-replayable): within each block of 10 doc_ids,
# r = doc_id % 10 picks the page's role — r in {1,2,3} redirects down
# the chain (3 -> 2 -> 1 -> 0, depth up to 3 onto the r=0 terminal);
# r=7 and r=8 form a 2-cycle; everything else is terminal and emits no
# edge. All three outcomes (1-3 hop resolution, loop flag) carry rows.


def _constructed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    r = F.col("doc_id") % 10
    target_id = (
        F.when(r.isin(1, 2, 3), F.col("doc_id") - 1)
        .when(r == 7, F.col("doc_id") + 1)
        .when(r == 8, F.col("doc_id") - 1)
    )
    base = docs.select(
        "doc_id", "source", synthetic_url().alias("src_url"), target_id.alias("tid")
    ).filter(F.col("tid").isNotNull())
    # target url rebuilt by the same synthetic rule; same-source blocks
    # keep host stable (doc_id%10 never crosses a source boundary of
    # the %20 source cycle within +-1)
    return base.select(
        "src_url",
        F.concat(
            F.lit("https://src"),
            (F.col("tid") % 20).cast("string"),
            F.lit(".example/doc"),
            F.col("tid").cast("string"),
            F.lit(".txt"),
        ).alias("dst_url"),
    )


def _redirect_oracle(rounds: int) -> str:
    url_of = (
        "'https://src' || CAST({i} % 20 AS VARCHAR)"
        " || '.example/doc' || CAST({i} AS VARCHAR) || '.txt'"
    )
    sql = f"""
    WITH e AS MATERIALIZED (
      SELECT {_URL_SQL} AS src_url,
             {url_of.format(i="tid")} AS dst_url
      FROM (
        SELECT doc_id, source,
               CASE WHEN doc_id % 10 IN (1, 2, 3) THEN doc_id - 1
                    WHEN doc_id % 10 = 7 THEN doc_id + 1
                    WHEN doc_id % 10 = 8 THEN doc_id - 1
               END AS tid
        FROM documents
      ) WHERE tid IS NOT NULL
    ),
    m0 AS MATERIALIZED (
      SELECT src_url, dst_url AS cur, 1 AS hops FROM e
    )"""
    for i in range(1, rounds + 1):
        p = i - 1
        sql += f""",
    m{i} AS MATERIALIZED (
      SELECT a.src_url,
             coalesce(b.cur, a.cur) AS cur,
             a.hops + coalesce(b.hops, 0) AS hops
      FROM m{p} a LEFT JOIN m{p} b ON a.cur = b.src_url
    )"""
    return (
        sql
        + f"""
    SELECT m.src_url,
           CASE WHEN s.src_url IS NULL THEN m.cur ELSE '' END AS final_url,
           CAST(m.hops AS BIGINT) AS hops,
           s.src_url IS NULL AS resolved
    FROM m{rounds} m
    LEFT JOIN (SELECT DISTINCT src_url FROM e) s ON m.cur = s.src_url
    """
    )


@register("redirect_chain_resolve", oracle=_redirect_oracle(ROUNDS))
def redirect_chain_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointer-doubling redirect collapse over a constructed chain
    corpus (3-deep chains + a 2-cycle per 10-doc block) — every
    doubled pointer, hop count, terminal target, and loop flag
    value-hashed against the DuckDB replay of the identical rounds."""
    edges = _constructed_edges(spark, sf_dir)
    return resolve_redirects(edges, ROUNDS)
