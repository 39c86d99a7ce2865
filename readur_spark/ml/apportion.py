"""Crawl-budget apportionment (largest-remainder / Hamilton method).

A recrawl round has a fixed fetch budget and a per-host score (quality
rollup x novelty, or whatever the policy multiplies); turning scores
into INTEGER per-host quotas that sum EXACTLY to the budget is the
apportionment problem. The largest-remainder method (Hamilton; the
same arithmetic election systems publish) is the standard exact
answer:

    quota_i  = floor(budget * s_i / S)  +  1 if i wins a leftover seat
    leftover = budget - sum(floors)      (< n_hosts by construction)
    seats go to the largest remainders (budget*s_i mod S), ties to the
    lexicographically smaller host — a deterministic total order, so
    re-runs and engines agree on the exact winning set.

All arithmetic is integer (floor division and modulo on non-negative
longs — truncating div == flooring // cross-engine); no float ratio
ever materializes, so the quota column replays bit-for-bit.

Scale design (10^8 hosts):
  - S is ONE scalar from a map-side-combinable agg, broadcast back;
  - floors/remainders are a pure projection;
  - the leftover election is a bounded top-k (leftover < n_hosts, and
    in practice << : it needs the k largest remainders, one
    TakeOrderedAndProject — no global sort, no window over a single
    partition;
  - `leftover` itself is a 1-row scalar (documented-bounded collect,
    same stance as ml/quality_lm.py's capped vocab).

Reference tie-in: the reference engine throttles per-source sync
concurrency with fixed caps (src/services/source_sync.rs semaphore
paths); this is the corpus-wide budgeted form of the same decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

CRAWL_BUDGET = 10_000


def apportion_budget(
    scores: DataFrame,
    budget: int,
    *,
    host_col: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """(host, score, quota) with sum(quota) == budget exactly.

    Hosts with score <= 0 get quota 0 and never win leftover seats.
    Requires a non-empty positive-score set (S > 0)."""
    pos = scores.filter(F.col(score_col) > 0)
    total = pos.agg(F.sum(score_col).alias("_S"))
    d = pos.crossJoin(F.broadcast(total))
    d = d.select(
        host_col,
        score_col,
        F.expr(f"({budget} * {score_col}) div _S").alias("_floor"),
        F.expr(f"({budget} * {score_col}) % _S").alias("_rem"),
    )
    floors_sum = d.agg(F.sum("_floor")).collect()[0][0] or 0
    leftover = int(budget - floors_sum)
    winners = (
        d.orderBy(F.col("_rem").desc(), F.col(host_col))
        .limit(leftover)
        .select(host_col)
        .withColumn("_seat", F.lit(1))
    )
    out = (
        d.join(winners, host_col, "left")
        .select(
            host_col,
            score_col,
            (F.col("_floor") + F.coalesce(F.col("_seat"), F.lit(0)))
            .cast("long")
            .alias("quota"),
        )
    )
    zeros = scores.filter(
        (F.col(score_col) <= 0) | F.col(score_col).isNull()
    ).select(
        host_col, score_col, F.lit(0).cast("long").alias("quota")
    )
    return out.unionByName(zeros)


# ---- driver-contract query ------------------------------------------------


@register(
    "crawl_budget_apportion",
    oracle=f"""
    WITH s AS (
      SELECT source || '.example' AS host,
             CAST(sum(n_chars) AS BIGINT) AS score
      FROM documents GROUP BY source || '.example'
    ),
    t AS (SELECT CAST(sum(score) AS BIGINT) AS S FROM s),
    d AS (
      SELECT host, score,
             ({CRAWL_BUDGET} * score) // t.S AS fl,
             ({CRAWL_BUDGET} * score) % t.S AS rem
      FROM s, t
    ),
    lo AS (
      SELECT {CRAWL_BUDGET} - CAST(sum(fl) AS BIGINT) AS k FROM d
    ),
    r AS (
      SELECT host,
             row_number() OVER (ORDER BY rem DESC, host) AS rk
      FROM d
    )
    SELECT d.host, d.score,
           CAST(d.fl + CASE WHEN r.rk <= lo.k THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM d JOIN r USING (host), lo
    """,
)
def crawl_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder fetch-budget apportionment over per-host
    content mass (sum of n_chars) — floors, remainders, the leftover
    seat election, and the exact-sum quotas all value-hashed against
    the DuckDB replay."""
    docs = load(spark, sf_dir, "documents")
    scores = docs.groupBy(
        F.concat(F.col("source"), F.lit(".example")).alias("host")
    ).agg(F.sum("n_chars").cast("long").alias("score"))
    return apportion_budget(scores, CRAWL_BUDGET)
