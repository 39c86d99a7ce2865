"""DoReMi-style domain reweighting (integer-exact batch form).

Published recipe (Xie et al., "DoReMi: Optimizing Data Mixtures
Speeds Up Language Model Pretraining", NeurIPS 2023, re-implemented
from the paper's description): train a small proxy model, measure
each domain's EXCESS loss over a reference model, and up-weight
domains with high excess via exponentiated-gradient (Group-DRO)
updates — the resulting domain weights transfer to the full-size
training run. The batch re-expression here is the checkable core of
one EG step with the corpus itself as both proxy and reference:

  1. proxy loss      per-domain mean LM surprisal from ml/kneser.py's
                     interpolated Kneser-Ney bigram model
                     (loss_cbits = (100 * Σ kn_sum_bits) div
                     Σ n_bigrams — centi-bits per bigram);
  2. reference loss  the corpus-wide mean under the SAME model (the
                     paper's baseline role: what a domain-agnostic
                     mixture achieves);
  3. excess          greatest(loss_dom - loss_ref, 0) — the Group-DRO
                     clamp: only domains the proxy finds HARDER than
                     average gain weight;
  4. EG tilt         score = 1000 << min(excess div DOREMI_TAU,
                     DOREMI_CAP) — the exponential update exp(eta *
                     excess) in exact base-2 integer form: every
                     DOREMI_TAU centi-bits of excess doubles the
                     domain's weight, capped so budget * score stays
                     far inside BIGINT;
  5. apportionment   ml/apportion.py's largest-remainder method turns
                     the weights into integer token quotas summing
                     EXACTLY to DOREMI_BUDGET.

Every stage is integer arithmetic on non-negative operands, so the
DuckDB twin replays the whole chain — KN model, per-domain losses,
clamp, power-of-two tilt, floors/remainders, and the leftover-seat
election — value for value.

Scale design (10^12 docs):
  - the KN chain is ml/kneser.py's (one bigram pass -> grouped c12
    frame); its per-doc output is slim (doc_id, 3 longs);
  - per-domain and corpus-wide losses are map-side-combinable sums
    over that slim frame; the domain stats frame has one row per
    domain (10^7-ish for the web) — every later step runs on it;
  - the apportionment's leftover election is a bounded top-k
    (TakeOrderedAndProject), no global sort (see ml/apportion.py).

Reference tie-in: the reference engine exposes per-source document
counts and failure rates for operators to rebalance ingestion
(src/routes/sources.rs stats endpoints); this is the loss-driven
version a pre-training mixture uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.apportion import apportion_budget
from readur_spark.ml.kneser import _KN_ORACLE, kn_bigram_surprisal
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

DOREMI_TAU = 25       # centi-bits of excess per weight doubling
DOREMI_CAP = 20       # max doublings: score <= 1000 * 2^20 ~ 1e9
DOREMI_BUDGET = 1_000_000  # token quota to apportion (integer units)


def domain_excess_losses(
    per_doc: DataFrame, docs: DataFrame, *, domain_col: str = "source"
) -> DataFrame:
    """(domain, loss_cbits, excess_cbits) from the per-doc KN frame.
    Loss = pooled centi-bits per bigram (weighted by bigram count,
    exactly as the model scores the domain's token stream); excess is
    clamped at the corpus-wide pooled mean."""
    joined = per_doc.join(
        docs.select("doc_id", F.col(domain_col).alias("domain")), "doc_id"
    )
    dom = joined.groupBy("domain").agg(
        F.expr("(100L * sum(kn_sum_bits)) div sum(n_bigrams)")
        .alias("loss_cbits")
    )
    ref = per_doc.agg(
        F.expr("(100L * sum(kn_sum_bits)) div sum(n_bigrams)").alias("_ref")
    )
    return dom.crossJoin(F.broadcast(ref)).select(
        "domain",
        "loss_cbits",
        F.greatest(F.col("loss_cbits") - F.col("_ref"), F.lit(0).cast("long"))
        .alias("excess_cbits"),
    )


def eg_domain_weights(excess: DataFrame) -> DataFrame:
    """(domain, loss_cbits, excess_cbits, score) — one exponentiated-
    gradient step in exact base-2 integers."""
    return excess.select(
        "domain",
        "loss_cbits",
        "excess_cbits",
        F.expr(
            f"shiftleft(1000L, CAST(least(excess_cbits div {DOREMI_TAU}L,"
            f" {DOREMI_CAP}L) AS INT))"
        ).alias("score"),
    )


def doremi_plan(
    docs: DataFrame, *, domain_col: str = "source",
    budget: int = DOREMI_BUDGET,
) -> DataFrame:
    """The composed chain: KN proxy losses -> excess -> EG tilt ->
    largest-remainder token quotas summing exactly to `budget`."""
    per_doc = kn_bigram_surprisal(docs).localCheckpoint(eager=True)
    weights = eg_domain_weights(
        domain_excess_losses(per_doc, docs, domain_col=domain_col)
    ).localCheckpoint(eager=True)
    quotas = apportion_budget(
        weights.select("domain", "score"), budget,
        host_col="domain", score_col="score",
    )
    return weights.join(quotas.select("domain", "quota"), "domain").select(
        "domain", "loss_cbits", "excess_cbits", "score", "quota"
    )


_DOREMI_ORACLE = f"""
    WITH q AS ({_KN_ORACLE}),
    dom AS (
      SELECT d.source AS domain,
             CAST((100 * sum(q.kn_sum_bits)) // sum(q.n_bigrams)
                  AS BIGINT) AS loss_cbits
      FROM q JOIN documents d USING (doc_id)
      GROUP BY d.source
    ),
    ref AS (
      SELECT CAST((100 * sum(kn_sum_bits)) // sum(n_bigrams) AS BIGINT)
               AS ref
      FROM q
    ),
    sc AS (
      SELECT domain, loss_cbits,
             greatest(loss_cbits - (SELECT ref FROM ref), 0)
               AS excess_cbits,
             CAST(1000 * (1::BIGINT << least(
               greatest(loss_cbits - (SELECT ref FROM ref), 0)
                 // {DOREMI_TAU}, {DOREMI_CAP})) AS BIGINT) AS score
      FROM dom
    ),
    t AS (SELECT CAST(sum(score) AS BIGINT) AS S FROM sc),
    d AS (
      SELECT domain, loss_cbits, excess_cbits, score,
             ({DOREMI_BUDGET} * score) // t.S AS fl,
             ({DOREMI_BUDGET} * score) % t.S AS rem
      FROM sc, t
    ),
    lo AS (
      SELECT {DOREMI_BUDGET} - CAST(sum(fl) AS BIGINT) AS k FROM d
    ),
    r AS (
      SELECT domain, row_number() OVER (ORDER BY rem DESC, domain) AS rk
      FROM d
    )
    SELECT d.domain, d.loss_cbits, d.excess_cbits, d.score,
           CAST(d.fl + CASE WHEN r.rk <= lo.k THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM d JOIN r USING (domain), lo
    """


@register("doremi_domain_weights", oracle=_DOREMI_ORACLE)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style excess-loss domain reweighting over the documents
    corpus — the KN proxy model, pooled per-domain losses, the
    Group-DRO clamp, the base-2 EG tilt, and the exact Hamilton
    quotas all replayed stage-for-stage by DuckDB."""
    return doremi_plan(load(spark, sf_dir, "documents"))
