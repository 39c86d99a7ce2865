"""PMI collocation mining — the corpus-level phrase table.

Published recipe (Church & Hanks 1990 pointwise mutual information;
the word2vec phrase-joining preprocessor and every n-gram phrase table
since): a bigram (x, y) is a collocation when it occurs far more often
than its parts predict — PMI = log2(P(x,y) / (P(x)·P(y))). Curation
pipelines mine these to (a) protect multi-word entities from
token-level filters and (b) monitor phrase drift across dumps. The
reference engine's nearest analogue is its search-suggestion phrase
rewrites (src/routes/search.rs:144-165); this is the corpus-statistics
generalization.

Integer-exact semantics (DuckDB value-hashes every row):
    pmi_bits = floor(log2(c_xy · T / (c_x · c_y)))  computed as
    int_log2((c_xy · ((256·T) div c_x)) div c_y) − 8
— the 2^8 pre-scale keeps the nested floor divisions from eating up
to a whole bit when c_x is large, and every intermediate fits BIGINT
at 10^12-doc scale (256·T ≈ 1.3·10^17 for T = 5·10^14 tokens;
c_xy·(256·T div c_x) ≤ 256·T since c_xy ≤ c_x).

Scale design:
  - the payload collapses to a slim adjacent-pair projection at the
    scan (array slicing, no self-join); bigram and unigram counts are
    two map-side-combinable aggregates;
  - the unigram side joins onto the bigram table twice on the token —
    both vocab-sized frames, Zipf-compact; T is a 1-row scalar from
    the SAME grouped frame (the quality_lm single-pass convention);
  - selection is TakeOrderedAndProject (per-partition top-k heaps, no
    global sort, no window).

The registered query runs over a CONSTRUCTED corpus (the synthetic
documents table draws tokens ~uniformly from one shared vocabulary, so
it has no collocational structure to find): modulo rules append known
phrases, and the DuckDB oracle replays construction, counts, and the
fixed-point PMI end-to-end — the ml/paradedup.py pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.quality_lm import TOKEN_SPLIT_RE, int_log2
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

MIN_COUNT = 5
TOP_K = 50


def bigram_pmi(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = MIN_COUNT,
    top_k: int = TOP_K,
) -> DataFrame:
    """(x, y, c_xy, pmi_bits) — the top_k positive-PMI adjacent-token
    collocations with support ≥ min_count, deterministically ordered
    by (pmi_bits desc, c_xy desc, x, y)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    d = docs.select(toks.alias("_t"))
    bigrams = (
        d.select(
            F.explode(
                F.when(
                    F.size("_t") >= 2,
                    F.sequence(F.lit(1), F.size("_t") - 1),
                ).otherwise(F.expr("array()").cast("array<int>"))
            ).alias("i"),
            "_t",
        )
        .select(
            F.expr("_t[i - 1]").alias("x"),
            F.expr("_t[i]").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    uni = (
        d.select(F.explode("_t").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()  # one grouped frame feeds both T and the joins
    )
    total = int(uni.agg(F.sum("c")).collect()[0][0] or 0)
    scored = (
        bigrams.filter(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("token").alias("x"), F.col("c").alias("c_x")), "x")
        .join(uni.select(F.col("token").alias("y"), F.col("c").alias("c_y")), "y")
        .withColumn(
            "_arg",
            F.expr(f"(c_xy * ({256 * total}L div c_x)) div c_y"),
        )
        .filter(F.col("_arg") >= 256)  # positive PMI only
        .withColumn("pmi_bits", int_log2(F.col("_arg")) - 8)
    )
    out = (
        scored.orderBy(
            F.desc("pmi_bits"), F.desc("c_xy"), F.asc("x"), F.asc("y")
        )
        .limit(top_k)
        .select("x", "y", "c_xy", "pmi_bits")
    )
    return out


# constructed collocations: known phrases appended by modulo rule
_PHRASE_3 = " quantum entanglement spectral clustering"
_PHRASE_5 = " gradient descent"

_CONSTRUCT_SQL = f"""
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN '{_PHRASE_3}' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN '{_PHRASE_5}' ELSE '' END
           AS text
  FROM documents
"""


def constructed_collocation_pages(docs: DataFrame) -> DataFrame:
    """Deterministic phrase injection the DuckDB oracle replays: every
    doc_id % 3 == 0 page gains two fixed phrases, every doc_id % 5 == 0
    page gains one — real collocations with known counts on a corpus
    that otherwise has none."""
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_PHRASE_3)).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 5 == 0, F.lit(_PHRASE_5)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )


@register(
    "collocations_pmi",
    oracle=f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    d AS (
      SELECT list_filter(
               regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
               x -> x <> '') AS ts
      FROM c
    ),
    big AS (
      SELECT ts[i.i] AS x, ts[i.i + 1] AS y, count(*) AS c_xy
      FROM d, UNNEST(range(1, greatest(len(ts) - 1, 0) + 1)) AS i(i)
      GROUP BY 1, 2
    ),
    uni AS (
      SELECT token, count(*) AS c
      FROM (SELECT unnest(ts) AS token FROM d)
      GROUP BY token
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM uni),
    scored AS (
      SELECT big.x, big.y, big.c_xy,
             (big.c_xy * ((256 * (SELECT t FROM tot)) // ux.c)) // uy.c
               AS arg
      FROM big
      JOIN uni ux ON big.x = ux.token
      JOIN uni uy ON big.y = uy.token
      WHERE big.c_xy >= {MIN_COUNT}
    )
    SELECT x, y, CAST(c_xy AS BIGINT) AS c_xy,
           CAST(length(bin(arg)) - 1 - 8 AS BIGINT) AS pmi_bits
    FROM scored WHERE arg >= 256
    ORDER BY pmi_bits DESC, c_xy DESC, x, y LIMIT {TOP_K}
    """,
)
def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top positive-PMI collocations over the constructed corpus —
    construction, both count tables, the pre-scaled fixed-point ratio,
    and the integer log all value-hashed against the DuckDB twin."""
    docs = constructed_collocation_pages(load(spark, sf_dir, "documents"))
    return bigram_pmi(docs)


# ---- TextRank keywords (weighted PageRank over the word graph) ----------

TR_ITERS = 4
TR_TOP_K = 50


def textrank_keywords(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_iters: int = TR_ITERS,
    top_k: int = TR_TOP_K,
) -> DataFrame:
    """(token, rank) — the top_k corpus keywords by TextRank
    (Mihalcea & Tarau 2004): integer PageRank over the UNDIRECTED
    adjacent-token co-occurrence graph, edge weight = co-occurrence
    count, self-loops dropped. Runs ml/linkgraph.py's
    pagerank_fixed_point with its weight_col path — each edge row
    stands for w parallel links (contribution w·(rank div Σw)).

    Scale: the graph is vocab-sized (Zipf-compact regardless of corpus
    size); building it is the same two aggregates as bigram_pmi; the
    fixed point runs on slim (token, rank) frames. Selection is
    TakeOrdered."""
    from readur_spark.ml.linkgraph import pagerank_fixed_point

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    d = docs.select(toks.alias("_t"))
    big = (
        d.select(
            F.explode(
                F.when(
                    F.size("_t") >= 2,
                    F.sequence(F.lit(1), F.size("_t") - 1),
                ).otherwise(F.expr("array()").cast("array<int>"))
            ).alias("i"),
            "_t",
        )
        .select(F.expr("_t[i - 1]").alias("x"), F.expr("_t[i]").alias("y"))
        .filter(F.col("x") != F.col("y"))
    )
    edges = (
        big.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .unionAll(big.select(F.col("y").alias("src"), F.col("x").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    ranks = pagerank_fixed_point(edges, num_iters, weight_col="w")
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(top_k)
        .select(F.col("node").alias("token"), "rank")
    )


def _textrank_oracle(num_iters: int, top_k: int) -> str:
    """DuckDB replay of the word graph + the WEIGHTED integer fixed
    point (w·(rank // Σw) — the exact weight_col semantics of
    ml/linkgraph.py). MATERIALIZED CTEs for the same inlining reason
    as _pagerank_oracle."""
    from readur_spark.ml.linkgraph import DAMPING_PCT, SCALE

    scale, damp = SCALE, DAMPING_PCT
    sql = f"""
    WITH d AS MATERIALIZED (
      SELECT list_filter(
               regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
               x -> x <> '') AS ts
      FROM documents
    ),
    big AS MATERIALIZED (
      SELECT ts[i.i] AS x, ts[i.i + 1] AS y
      FROM d, UNNEST(range(1, greatest(len(ts) - 1, 0) + 1)) AS i(i)
      WHERE ts[i.i] <> ts[i.i + 1]
    ),
    e AS MATERIALIZED (
      SELECT src, dst, count(*) AS w FROM (
        SELECT x AS src, y AS dst FROM big
        UNION ALL
        SELECT y AS src, x AS dst FROM big
      ) GROUP BY src, dst
    ),
    nodes AS MATERIALIZED (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ),
    nstat AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
    deg AS MATERIALIZED (
      SELECT src AS node, sum(w) AS outdeg FROM e GROUP BY src
    ),
    adj AS MATERIALIZED (
      SELECT e.src AS node, e.dst, e.w, deg.outdeg
      FROM e JOIN deg ON e.src = deg.node
    ),
    r0 AS MATERIALIZED (
      SELECT node, {scale} // (SELECT n FROM nstat) AS rank FROM nodes
    )"""
    for k in range(1, num_iters + 1):
        p = k - 1
        sql += f""",
    s{k} AS MATERIALIZED (
      SELECT a.dst AS node, sum(a.w * (r.rank // a.outdeg)) AS s
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
    SELECT node AS token, rank FROM r{num_iters}
    ORDER BY rank DESC, token LIMIT {top_k}
    """
    return sql


@register("textrank_keywords", oracle=_textrank_oracle(TR_ITERS, TR_TOP_K))
def textrank_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TextRank keywords — graph derivation, weighted degree,
    and all damping iterations value-hashed against the DuckDB replay.
    Exercises pagerank_fixed_point's weight_col path end-to-end (the
    r5 refactor that makes pre-aggregated edges keep multiplicity)."""
    return textrank_keywords(load(spark, sf_dir, "documents"))
