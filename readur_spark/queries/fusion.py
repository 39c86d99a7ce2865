"""Reciprocal-Rank Fusion of independent rankers (integer-exact).

Published recipe (Cormack, Clarke & Buettcher, "Reciprocal Rank
Fusion outperforms Condorcet and individual Rank Learning Methods",
SIGIR 2009): combine result lists from heterogeneous rankers by
summing 1 / (K + rank) per list — robust to incomparable score
scales because only RANKS cross the fusion boundary. This is the
standard way a production search tier merges its lexical ranker with
a second signal (here: fixed-point Okapi BM25 fused with the linear
term-frequency ranker; the same operator fuses in an ANN similarity
list — ml/similarity.py — unchanged, since fusion only consumes
(doc_id, rank) pairs).

Integer-exact form: contribution = 10^6 div (K + rank) with the
classic K = 60; ranks are row_number over (score DESC, doc_id) — a
deterministic total order, so both engines assign identical ranks and
the fused scores replay bit-for-bit.

Scale design: each ranker's result list is already bounded by its
match set (query-bounded, not corpus-bounded); the ranking window
runs over that slim (doc_id, score) frame — same bounded-window
stance as kn_percentile_by_lang. The fusion itself is two
broadcast-size sorted joins + one projection.

Reference tie-in: the reference's hybrid search mode merges FTS and
substring match sets with score weighting (src/db/search.rs,
SURVEY.md §2 B5/B9); RRF is the rank-based merge the IR literature
recommends when scales differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries import search as _search  # registration side effects
from readur_spark.queries.registry import _ORACLES, register

RRF_K = 60
RRF_SCALE = 1_000_000


def rrf_fuse(lists: list[DataFrame], *, id_col: str = "doc_id") -> DataFrame:
    """Fuse (id, rank) frames: score = sum(RRF_SCALE div (K + rank)).
    Returns (id, rrf_score, n_lists) — n_lists = how many rankers
    returned the document (a useful agreement diagnostic)."""
    tagged = [
        df.select(
            F.col(id_col),
            F.expr(f"{RRF_SCALE} div ({RRF_K}L + rank)").alias("c"),
        )
        for df in lists
    ]
    allc = tagged[0]
    for t in tagged[1:]:
        allc = allc.unionByName(t)
    return allc.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("rrf_score"),
        F.count("*").cast("long").alias("n_lists"),
    )


def ranked(df: DataFrame, score_col: str, *, id_col: str = "doc_id",
           ascending: bool = False) -> DataFrame:
    """(id, rank) with the deterministic (score, id) total order."""
    order = (
        [F.col(score_col).asc(), F.col(id_col).asc()]
        if ascending
        else [F.col(score_col).desc(), F.col(id_col).asc()]
    )
    return df.select(
        F.col(id_col),
        F.row_number().over(Window.orderBy(*order)).cast("long")
        .alias("rank"),
    )


_RRF_ORACLE = f"""
    WITH bm AS ({{bm25}}),
    tfq AS ({{tf}}),
    rb AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY rank_bm25_fp DESC, doc_id) AS r
      FROM bm
    ),
    rt AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY rank_tf DESC, doc_id) AS r
      FROM tfq
    ),
    c AS (
      SELECT doc_id, {RRF_SCALE} // ({RRF_K} + r) AS c FROM rb
      UNION ALL
      SELECT doc_id, {RRF_SCALE} // ({RRF_K} + r) AS c FROM rt
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_score,
           CAST(count(*) AS BIGINT) AS n_lists
    FROM c GROUP BY doc_id
    """


def _register_rrf() -> None:
    oracle = _RRF_ORACLE.format(
        bm25=_ORACLES["search_rank_bm25"], tf=_ORACLES["search_rank_tf"]
    )

    @register("search_rrf_fusion", oracle=oracle)
    def search_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
        """RRF fusion of the fixed-point BM25 ranker and the linear tf
        ranker — both input rankings, the reciprocal contributions,
        and the fused scores replayed exactly by DuckDB (the member
        oracles run verbatim as CTEs)."""
        bm = _search.search_rank_bm25(spark, sf_dir)
        tf = _search.search_rank_tf(spark, sf_dir)
        return rrf_fuse([
            ranked(bm, "rank_bm25_fp"),
            ranked(tf, "rank_tf"),
        ])


_register_rrf()


# ---- ranker agreement: exact-integer Kendall tau-a -------------------------


def kendall_tau_a(
    scores: DataFrame, *, id_col: str = "doc_id",
    s1_col: str = "s1", s2_col: str = "s2",
) -> DataFrame:
    """One row (n_pairs, concordant, discordant, tied_either,
    tau_a_milli) over all unordered id pairs of a two-score frame.
    tau_a = (C - D) / n_pairs in milli-units through the sign-abs
    division (C < D is legal). The pair join is quadratic in the
    MATCH SET (query-bounded, not corpus-bounded) — the same stance
    as the rankers it evaluates; at corpus scale it runs on a
    sampled slice."""
    a = scores.select(
        F.col(id_col).alias("ia"),
        F.col(s1_col).alias("s1a"), F.col(s2_col).alias("s2a"),
    )
    b = scores.select(
        F.col(id_col).alias("ib"),
        F.col(s1_col).alias("s1b"), F.col(s2_col).alias("s2b"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        (F.signum(F.col("s1a") - F.col("s1b"))
         * F.signum(F.col("s2a") - F.col("s2b"))).cast("long").alias("sgn"),
    )
    agg = pairs.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0)).cast("long")
        .alias("concordant"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0)).cast("long")
        .alias("discordant"),
        F.sum(F.when(F.col("sgn") == 0, 1).otherwise(0)).cast("long")
        .alias("tied_either"),
    )
    num = "1000 * (concordant - discordant)"
    return agg.select(
        "n_pairs", "concordant", "discordant", "tied_either",
        F.expr(
            "CASE WHEN n_pairs = 0 THEN 0 ELSE "
            f"CASE WHEN ({num}) >= 0 THEN ({num}) div n_pairs"
            f" ELSE -((-({num})) div n_pairs) END END"
        ).cast("long").alias("tau_a_milli"),
    )


def _register_kendall() -> None:
    oracle = f"""
    WITH bm AS ({_ORACLES["search_rank_bm25"]}),
    tfq AS ({_ORACLES["search_rank_tf"]}),
    j AS (
      SELECT bm.doc_id, bm.rank_bm25_fp AS s1, tfq.rank_tf AS s2
      FROM bm JOIN tfq USING (doc_id)
    ),
    p AS (
      SELECT sign(a.s1 - b.s1) * sign(a.s2 - b.s2) AS sgn
      FROM j a JOIN j b ON a.doc_id < b.doc_id
    ),
    agg AS (
      SELECT count(*) AS n_pairs,
             sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS concordant,
             sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS discordant,
             sum(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS tied_either
      FROM p
    )
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(concordant AS BIGINT) AS concordant,
           CAST(discordant AS BIGINT) AS discordant,
           CAST(tied_either AS BIGINT) AS tied_either,
           CAST(CASE WHEN n_pairs = 0 THEN 0 ELSE
             CASE WHEN 1000 * (concordant - discordant) >= 0
                  THEN (1000 * (concordant - discordant)) // n_pairs
                  ELSE -((-(1000 * (concordant - discordant))) // n_pairs)
             END END AS BIGINT) AS tau_a_milli
    FROM agg
    """

    @register("search_rank_kendall", oracle=oracle)
    def search_rank_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Kendall tau-a agreement between the BM25 and tf rankers on
        their common match set — the 'do we need fusion?' diagnostic
        next to search_rrf_fusion (low tau = the rankers disagree and
        rank-merging carries real information). Pair signs, tie
        counts, and the milli tau all replayed by DuckDB with the
        member oracles embedded verbatim."""
        bm = _search.search_rank_bm25(spark, sf_dir).select(
            "doc_id", F.col("rank_bm25_fp").alias("s1")
        )
        tf = _search.search_rank_tf(spark, sf_dir).select(
            "doc_id", F.col("rank_tf").cast("long").alias("s2")
        )
        return kendall_tau_a(bm.join(tf, "doc_id"))


_register_kendall()
