"""Stratified eval-set construction (exact quotas, content-addressed).

Held-out evaluation sets for a multilingual corpus must (a) mirror the
corpus's strata proportions EXACTLY at a fixed total size, and (b) be
reproducible — the same documents selected on every engine, every
re-run, every shard union. Both are solved with machinery this engine
already checks: per-stratum Hamilton quotas (ml/apportion.py — the
largest-remainder method, quotas summing exactly to the budget) and
content-addressed ranking (ml/mixing.py's md5 recipe — a document's
rank within its stratum depends only on its URL and the seed, never on
partitioning or arrival order). Selection = rank <= quota.

This is the sampling dual of ml/mixing.py's samplers: those draw
TRAINING mixtures by weight; this carves a fixed-size, proportionally
exact EVALUATION slice. Composes with ml/leakage.py: run the leakage
audit with the eval flag as the split to certify the held-out slice
before trusting its loss.

Scale design (10^12 docs):
  - stratum counts are one map-side-combinable agg; quotas run on the
    one-row-per-stratum frame (ml/apportion.py's bounded election);
  - the per-stratum rank is a window over (stratum) partitions — the
    same per-shard-rank stance as ml/curriculum.py: strata are
    languages/sources (bounded cardinality, millions of rows each at
    worst), and the window input is the slim (id, stratum, hash)
    frame, never the payload. For a pathological mega-stratum the
    hash-threshold pre-filter (keep hash < quota/count scaled, then
    rank the ~quota-sized survivor set) bounds the window input; at
    the demo scale the direct window IS the honest plan;
  - the output is a flag column — membership joins back to the
    payload wherever the consumer needs text.

Reference tie-in: the reference samples per-source documents for its
OCR-accuracy spot checks (SURVEY.md §5 test strategy); this is the
exact-quota, reproducible version an evaluation harness needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.ml.apportion import apportion_budget
from readur_spark.queries.registry import register
from readur_spark.queries.tables import SYNTH_URL_SQL, load, synthetic_url

EVAL_BUDGET = 100
EVAL_SEED = "evalset1"


def stratified_eval_plan(
    docs: DataFrame, *, budget: int = EVAL_BUDGET, seed: str = EVAL_SEED,
    stratum_col: str = "lang", key_col: str = "url", id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, stratum, rk, quota, in_eval) — exact per-stratum
    Hamilton quotas over stratum sizes, membership by seeded-md5 rank
    within the stratum."""
    sizes = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").cast("long").alias("score")
    )
    quotas = apportion_budget(
        sizes, budget, host_col="stratum", score_col="score"
    ).select("stratum", "quota")
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(seed), F.col(key_col)), "UTF-8")),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    ranked = docs.select(
        F.col(id_col),
        F.col(stratum_col).alias("stratum"),
        h.alias("_h"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("stratum").orderBy("_h", id_col)
        ).cast("long"),
    )
    return ranked.join(quotas, "stratum").select(
        id_col, "stratum", "rk", "quota",
        (F.col("rk") <= F.col("quota")).alias("in_eval"),
    )


_EVAL_ORACLE = f"""
    WITH u AS (
      SELECT doc_id, lang AS stratum, {SYNTH_URL_SQL} AS url FROM documents
    ),
    s AS (SELECT stratum, count(*) AS score FROM u GROUP BY stratum),
    t AS (SELECT CAST(sum(score) AS BIGINT) AS S FROM s),
    d AS (
      SELECT stratum, score,
             ({EVAL_BUDGET} * score) // t.S AS fl,
             ({EVAL_BUDGET} * score) % t.S AS rem
      FROM s, t
    ),
    lo AS (SELECT {EVAL_BUDGET} - CAST(sum(fl) AS BIGINT) AS k FROM d),
    r AS (
      SELECT stratum, row_number() OVER (ORDER BY rem DESC, stratum) AS rk
      FROM d
    ),
    q AS (
      SELECT d.stratum,
             CAST(d.fl + CASE WHEN r.rk <= lo.k THEN 1 ELSE 0 END
                  AS BIGINT) AS quota
      FROM d JOIN r USING (stratum), lo
    ),
    rk AS (
      SELECT doc_id, stratum,
             row_number() OVER (
               PARTITION BY stratum
               ORDER BY CAST(concat('0x',
                 substr(md5('{EVAL_SEED}' || url), 1, 15)) AS BIGINT),
               doc_id) AS rk
      FROM u
    )
    SELECT rk.doc_id, rk.stratum, CAST(rk.rk AS BIGINT) AS rk, q.quota,
           rk.rk <= q.quota AS in_eval
    FROM rk JOIN q USING (stratum)
    """


@register("eval_set_stratified", oracle=_EVAL_ORACLE)
def eval_set_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportionally exact, content-addressed eval-set membership
    over the documents corpus (strata = languages) — stratum sizes,
    Hamilton quotas, seeded-md5 ranks, and the membership gate all
    replayed by DuckDB."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "url", synthetic_url()
    )
    return stratified_eval_plan(docs)
