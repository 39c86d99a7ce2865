"""Ranking-quality evaluation — nDCG@k in exact fixed-point.

A search tier isn't done when it ranks; it's done when its ranking is
MEASURED. The standard metric is normalized Discounted Cumulative
Gain (Järvelin & Kekäläinen, TOIS 2002): graded relevance discounted
by 1/log2(rank+1), normalized by the ideal ordering's DCG. The repo's
no-libm rule holds here the same way it does for BM25's idf: the ten
discount weights round(10^6 / log2(i+1)) for i = 1..10 are PINNED
INTEGER CONSTANTS inlined identically into the Spark plan and the
DuckDB oracle, so DCG, IDCG, and nDCG are exact integer arithmetic —
no float ever enters the metric.

Relevance comes from a RULE THE RANKER CANNOT SEE (the synthetic twin
of human judgments): rel(q, doc) = min(tf, 2) + 1 if the document is
English else min(tf, 2) — graded 1..3 over matching docs. The ranker
under test is the tf-descending posting ranker (search_rank_tf's
order), which is blind to language — so nDCG lands strictly inside
(0, 1000) and actually measures the mismatch, instead of trivially
scoring 1000 the way a relevance defined from the ranking key would.

Scale design (10^12 docs): the eval frame is |queries| posting slices
— pruned BEFORE any join, the search tier's own access path; both
orderings are per-query windows over that slim frame, and the metric
is one map-side-combinable sum per query. Evaluating a thousand
queries is a thousand slices, not a corpus pass.

Reference tie-in: the reference ships search with no quality harness
(src/db/documents/search.rs has correctness tests only); this is the
measurement loop a corpus-scale search tier adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

NDCG_K = 10
# round(10^6 / log2(i + 1)) for i = 1..10 — pinned, see docstring.
DCG_W = [1000000, 630930, 500000, 430677, 386853, 356207,
         333333, 315465, 301030, 289065]
EVAL_TERMS = ["spark", "join", "data"]


def _w_array() -> F.Column:
    return F.array(*[F.lit(w) for w in DCG_W])


def ndcg_at_k(
    judged: DataFrame,
    *,
    query_col: str = "query",
    rank_key: str = "tf",
    rel_col: str = "rel",
    id_col: str = "doc_id",
    k: int = NDCG_K,
) -> DataFrame:
    """(query, n_rel, dcg_micro, idcg_micro, ndcg_milli) from a judged
    candidate frame. Ranking order = (rank_key DESC, id); ideal order
    = (rel DESC, id). Two per-query windows, one aggregate."""
    w_rank = Window.partitionBy(query_col).orderBy(
        F.col(rank_key).desc(), F.col(id_col)
    )
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), F.col(id_col)
    )
    pos = judged.select(
        query_col, rel_col,
        F.row_number().over(w_rank).alias("r"),
        F.row_number().over(w_ideal).alias("ri"),
    )
    w = _w_array()
    gain = F.when(
        F.col("r") <= k, F.col(rel_col) * F.element_at(w, F.col("r"))
    ).otherwise(F.lit(0))
    igain = F.when(
        F.col("ri") <= k, F.col(rel_col) * F.element_at(w, F.col("ri"))
    ).otherwise(F.lit(0))
    return (
        pos.groupBy(query_col)
        .agg(
            F.count("*").cast("long").alias("n_rel"),
            F.sum(gain).cast("long").alias("dcg_micro"),
            F.sum(igain).cast("long").alias("idcg_micro"),
        )
        .select(
            query_col, "n_rel", "dcg_micro", "idcg_micro",
            F.expr("(1000L * dcg_micro) div idcg_micro").alias(
                "ndcg_milli"
            ),
        )
    )


@register(
    "search_eval_ndcg",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, d.lang, t.token
      FROM documents d,
           UNNEST(list_filter(string_split(d.text, ' '), x -> x <> ''))
             AS t(token)
    ),
    tf AS (
      SELECT token AS query, doc_id, any_value(lang) AS lang,
             count(*) AS tf
      FROM toks WHERE token IN ({", ".join("'" + t + "'" for t in EVAL_TERMS)})
      GROUP BY token, doc_id
    ),
    judged AS (
      SELECT query, doc_id, tf,
             least(tf, 2) + CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
      FROM tf
    ),
    pos AS (
      SELECT query, rel,
             row_number() OVER (PARTITION BY query
                                ORDER BY tf DESC, doc_id) AS r,
             row_number() OVER (PARTITION BY query
                                ORDER BY rel DESC, doc_id) AS ri
      FROM judged
    ),
    wt AS (SELECT {str(DCG_W)} AS w)
    SELECT query,
           CAST(count(*) AS BIGINT) AS n_rel,
           CAST(sum(CASE WHEN r <= {NDCG_K}
                         THEN rel * (SELECT w FROM wt)[r] ELSE 0 END)
                AS BIGINT) AS dcg_micro,
           CAST(sum(CASE WHEN ri <= {NDCG_K}
                         THEN rel * (SELECT w FROM wt)[ri] ELSE 0 END)
                AS BIGINT) AS idcg_micro,
           CAST((1000 * sum(CASE WHEN r <= {NDCG_K}
                                 THEN rel * (SELECT w FROM wt)[r]
                                 ELSE 0 END))
                // sum(CASE WHEN ri <= {NDCG_K}
                            THEN rel * (SELECT w FROM wt)[ri]
                            ELSE 0 END) AS BIGINT) AS ndcg_milli
    FROM pos GROUP BY query
    """,
)
def search_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the tf-descending ranker against the rule-derived
    graded judgments, three single-term queries — candidate slices,
    both orderings, pinned discount weights, and the normalized metric
    all replayed exactly by DuckDB."""
    from readur_spark.operators.posting import build_postings

    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    judged = (
        postings.filter(F.col("token").isin(EVAL_TERMS))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            F.col("token").alias("query"), "doc_id", "tf",
            (
                F.least(F.col("tf"), F.lit(2))
                + (F.col("lang") == "en").cast("long")
            ).alias("rel"),
        )
    )
    return ndcg_at_k(judged)


# ---- MRR sibling ------------------------------------------------------------

MRR_REL_THRESHOLD = 3  # "fully relevant": max-grade judgments only


@register(
    "search_eval_mrr",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, d.lang, t.token
      FROM documents d,
           UNNEST(list_filter(string_split(d.text, ' '), x -> x <> ''))
             AS t(token)
    ),
    tf AS (
      SELECT token AS query, doc_id, any_value(lang) AS lang,
             count(*) AS tf
      FROM toks WHERE token IN ({", ".join("'" + t + "'" for t in EVAL_TERMS)})
      GROUP BY token, doc_id
    ),
    judged AS (
      SELECT query, doc_id, tf,
             least(tf, 2) + CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
      FROM tf
    ),
    pos AS (
      SELECT query, rel,
             row_number() OVER (PARTITION BY query
                                ORDER BY tf DESC, doc_id) AS r
      FROM judged
    )
    SELECT query,
           CAST(min(r) AS BIGINT) AS first_rel_rank,
           CAST(1000000 // min(r) AS BIGINT) AS rr_micro
    FROM pos WHERE rel >= {MRR_REL_THRESHOLD}
    GROUP BY query
    """,
)
def search_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first FULLY-relevant document (grade-3
    judgments only — binary MRR needs a sharper bar than 'contains
    the term') under the same blind tf ranker; 10^6 div rank is exact
    integer, replayed by DuckDB. Same pruned-slice plan as nDCG."""
    from readur_spark.operators.posting import build_postings

    docs = load(spark, sf_dir, "documents")
    postings = build_postings(docs, "doc_id", "text")
    judged = (
        postings.filter(F.col("token").isin(EVAL_TERMS))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            F.col("token").alias("query"), "doc_id", "tf",
            (
                F.least(F.col("tf"), F.lit(2))
                + (F.col("lang") == "en").cast("long")
            ).alias("rel"),
        )
    )
    w_rank = Window.partitionBy("query").orderBy(
        F.col("tf").desc(), F.col("doc_id")
    )
    pos = judged.select(
        "query", "rel", F.row_number().over(w_rank).alias("r")
    )
    return (
        pos.filter(F.col("rel") >= MRR_REL_THRESHOLD)
        .groupBy("query")
        .agg(F.min("r").cast("long").alias("first_rel_rank"))
        .select(
            "query", "first_rel_rank",
            F.expr("1000000L div first_rel_rank").alias("rr_micro"),
        )
    )
