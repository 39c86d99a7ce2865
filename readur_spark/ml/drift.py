"""Corpus drift between crawl snapshots — token-distribution shift.

Web corpora are rebuilt dump-by-dump, and the curation thresholds
tuned on one dump silently rot when the next dump's language shifts
(new spam campaigns, a CMS migration, a big host appearing or dying).
The standard monitoring answer is a distribution distance between the
previous and current snapshot's token (or signal) histograms — CCNet
publishes per-dump composition stats, and C4's documentation analyses
(Dodge et al., EMNLP'21) are exactly such dump-level token censuses.

This module computes the drift census in EXACT integer fixed point so
the DuckDB oracle replays it bit-for-bit:

  p_side(t)   token probability in micro-units: c*10^6 div T
  gap(t)      |p_a(t) - p_b(t)|
  TV          total-variation distance = sum(gap) div 2  (micro-units;
              0 = identical distributions, 10^6 = disjoint support)
  movers      top-k tokens by gap — the "what changed" readout

Scale design (10^12 docs per snapshot):
  - BOTH sides' counts come from ONE pass over the exploded token
    stream (conditional sums keyed on the snapshot id) — there is no
    snapshot-vs-snapshot join anywhere, just a map-side-combinable
    groupBy(token);
  - totals are a second aggregate over the SLIM (token, c_a, c_b)
    type frame (vocabulary-sized, not corpus-sized) broadcast back as
    a 1-row cross join;
  - TV is one more aggregate over that type frame; movers are a
    TakeOrderedAndProject, never a single-partition window;
  - the census is union-mergeable: per-token (c_a, c_b) partial sums
    from different shards add, so per-dump shards can be rolled up
    incrementally.

Reference tie-in: the reference tracks corpus-level composition only
as upload-time facets (mime/source counts, src/routes/documents.rs
facet endpoints); this is the longitudinal twin its single-snapshot
model never needs but a continuous crawl cannot live without.

Construction rule for the driver queries (SQL-replayable): snapshot A
is the even doc_ids, snapshot B the odd ones — a deterministic split
of the same corpus, so real drift is near-zero except where the rule
INJECTS it: docs with doc_id % 10 == 1 (snapshot B only) get the
token 'megaspam' appended 8 times, so 'megaspam' must surface as the
top mover, direction 'up'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

MICRO = 1_000_000


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda x: x != F.lit("")
    )


def token_drift_frame(
    docs: DataFrame, *, side_col: str = "side", text_col: str = "text"
) -> DataFrame:
    """Slim (token, c_a, c_b, p_a_micro, p_b_micro, gap_micro) type
    frame from documents carrying a 0/1 snapshot id. One exploded
    pass, conditional sums — no join between snapshots."""
    toks = docs.select(
        F.col(side_col).alias("side"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c_b"),
    )
    totals = counts.agg(
        F.sum("c_a").alias("t_a"), F.sum("c_b").alias("t_b")
    )
    frame = counts.crossJoin(F.broadcast(totals))
    p_a = F.expr(f"c_a * {MICRO} div t_a")
    p_b = F.expr(f"c_b * {MICRO} div t_b")
    return frame.select(
        "token",
        F.col("c_a").cast("long").alias("c_a"),
        F.col("c_b").cast("long").alias("c_b"),
        p_a.alias("p_a_micro"),
        p_b.alias("p_b_micro"),
        F.abs(p_a - p_b).alias("gap_micro"),
    )


def drift_summary(frame: DataFrame) -> DataFrame:
    """One-row TV-distance census over the type frame."""
    return frame.agg(
        F.sum(F.when(F.col("c_a") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_types_a"),
        F.sum(F.when(F.col("c_b") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_types_b"),
        F.sum(F.when((F.col("c_a") > 0) & (F.col("c_b") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_types_shared"),
        F.expr("sum(gap_micro) div 2").alias("tv_micro"),
    )


def drift_top_movers(frame: DataFrame, k: int = 10) -> DataFrame:
    """Top-k drifting tokens (gap desc, token asc — deterministic);
    orderBy+limit compiles to TakeOrderedAndProject, no window."""
    direction = (
        F.when(F.col("p_b_micro") > F.col("p_a_micro"), "up")
        .when(F.col("p_b_micro") < F.col("p_a_micro"), "down")
        .otherwise("flat")
    )
    return (
        frame.select(
            "token",
            "p_a_micro",
            "p_b_micro",
            "gap_micro",
            direction.alias("direction"),
        )
        .orderBy(F.col("gap_micro").desc(), "token")
        .limit(k)
    )


# ---- constructed-corpus driver queries -------------------------------------


def constructed_snapshot_docs(df: DataFrame) -> DataFrame:
    """(side, text) under the module docstring's injection rule."""
    spam = " megaspam" * 8
    text = F.when(
        F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(spam))
    ).otherwise(F.col("text"))
    return df.select(
        (F.col("doc_id") % 2).cast("int").alias("side"), text.alias("text")
    )


_CONSTRUCT_SQL = """
  SELECT CAST(doc_id % 2 AS INT) AS side,
         CASE WHEN doc_id % 10 = 1
              THEN text || repeat(' megaspam', 8) ELSE text END AS text
  FROM documents
"""

_FRAME_SQL = f"""
    c AS ({_CONSTRUCT_SQL}),
    toks AS (
      SELECT side, t.token
      FROM c, UNNEST(list_filter(
          regexp_split_to_array(lower(text), '[^a-z]+'),
          x -> x <> '')) AS t(token)
    ),
    counts AS (
      SELECT token,
             CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_a,
             CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c_b
      FROM toks GROUP BY token
    ),
    totals AS (
      SELECT CAST(sum(c_a) AS BIGINT) AS t_a,
             CAST(sum(c_b) AS BIGINT) AS t_b
      FROM counts
    ),
    frame AS (
      SELECT token, c_a, c_b,
             c_a * {MICRO} // t_a AS p_a_micro,
             c_b * {MICRO} // t_b AS p_b_micro,
             abs(c_a * {MICRO} // t_a - c_b * {MICRO} // t_b)
               AS gap_micro
      FROM counts, totals
    )
"""


@register(
    "corpus_drift_tv",
    oracle=f"""
    WITH {_FRAME_SQL}
    SELECT CAST(sum(CASE WHEN c_a > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_types_a,
           CAST(sum(CASE WHEN c_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_types_b,
           CAST(sum(CASE WHEN c_a > 0 AND c_b > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_types_shared,
           CAST(sum(gap_micro) // 2 AS BIGINT) AS tv_micro
    FROM frame
    """,
)
def corpus_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between the even/odd snapshot split
    with injected drift — type counts, shared support, and the TV
    readout all value-hashed."""
    docs = constructed_snapshot_docs(load(spark, sf_dir, "documents"))
    return drift_summary(token_drift_frame(docs))


@register(
    "corpus_drift_movers",
    oracle=f"""
    WITH {_FRAME_SQL}
    SELECT token, p_a_micro, p_b_micro, gap_micro,
           CASE WHEN p_b_micro > p_a_micro THEN 'up'
                WHEN p_b_micro < p_a_micro THEN 'down'
                ELSE 'flat' END AS direction
    FROM frame
    ORDER BY gap_micro DESC, token
    LIMIT 10
    """,
)
def corpus_drift_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 drifting tokens under the same split — the injected
    'megaspam' token must lead, direction 'up'; every probability and
    gap value-hashed."""
    docs = constructed_snapshot_docs(load(spark, sf_dir, "documents"))
    return drift_top_movers(token_drift_frame(docs))
