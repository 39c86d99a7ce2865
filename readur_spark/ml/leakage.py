"""Train/eval split-leakage audit (shingle overlap across the split).

ml/mixing.py's `dataset_split` is content-addressed by URL, so the
same URL can never straddle splits — but near-duplicate CONTENT under
different URLs can, and its own docstring warns that near-duplicates
must be collapsed first "or they straddle splits". This module makes
that warning a first-class, checkable audit: for every val/test
document, count the word-4-gram shingles it shares with the TRAIN
split, and roll the counts up into the per-split leakage report a
training run gates on. The same measurement underlies published
benchmark-contamination audits (the GPT-3 appendix's 13-gram overlap
and Lee et al. 2022's near-dup train/test analysis, re-expressed over
this engine's split); n=4 is deliberately MORE sensitive than
ml/decontam.py's 5-gram removal gate — an audit wants recall, and
removal decisions still go through the decontam tier.

Scale design (10^12 docs):
  - shingles travel as xxhash64 longs (ml/decontam.py convention);
  - unlike decontam (small eval side broadcast), BOTH sides here are
    corpus-scale — the train side is ~90% of the corpus — so the
    overlap is a plain hash-partitioned join on the shingle hash, two
    slim long columns per side, with map-side-combinable counts after;
    no broadcast, no literal;
  - the rollup is a 3-row aggregate over the per-doc hits frame.

Reference tie-in: the reference engine's duplicate-groups report
(SURVEY.md §2 B17) surfaces same-content documents; this is the
split-aware version a pre-training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.decontam import word_shingles
from readur_spark.ml.mixing import dataset_split
from readur_spark.queries.registry import register
from readur_spark.queries.tables import SYNTH_URL_SQL, load, synthetic_url

LEAK_SHINGLE_N = 4


def split_leakage_hits(
    split_docs: DataFrame, *,
    id_col: str = "doc_id", text_col: str = "text",
    split_col: str = "split", n_shingle: int = LEAK_SHINGLE_N,
) -> DataFrame:
    """(doc_id, split, n_hit_shingles) for every NON-train document
    sharing at least one word n-gram with the train split."""
    train_sh = (
        split_docs.filter(F.col(split_col) == "train")
        .select(F.explode(word_shingles(F.col(text_col), n_shingle))
                .alias("s"))
        .select(F.xxhash64("s").alias("hs"))
        .distinct()
    )
    eval_sh = (
        split_docs.filter(F.col(split_col) != "train")
        .select(
            F.col(id_col), F.col(split_col),
            F.explode(word_shingles(F.col(text_col), n_shingle)).alias("s"),
        )
        .select(id_col, split_col, F.xxhash64("s").alias("hs"))
    )
    # hash-partitioned join on hs: train is ~90% of the corpus, so
    # neither side broadcasts — both sides are slim longs by the time
    # they shuffle (module docstring)
    return (
        eval_sh.join(train_sh, "hs")
        .groupBy(id_col, split_col)
        .agg(F.count("*").cast("long").alias("n_hit_shingles"))
    )


def split_leakage_report(
    split_docs: DataFrame, *, id_col: str = "doc_id",
    split_col: str = "split", n_shingle: int = LEAK_SHINGLE_N,
) -> DataFrame:
    """(split, n_docs, n_leaked_docs, leaked_permille, sum_hit_shingles)
    for each non-train split."""
    hits = split_leakage_hits(
        split_docs, id_col=id_col, split_col=split_col, n_shingle=n_shingle
    )
    sizes = (
        split_docs.filter(F.col(split_col) != "train")
        .groupBy(split_col)
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    leaks = hits.groupBy(split_col).agg(
        F.count("*").cast("long").alias("n_leaked_docs"),
        F.sum("n_hit_shingles").cast("long").alias("sum_hit_shingles"),
    )
    return sizes.join(leaks, split_col, "left").select(
        split_col,
        "n_docs",
        F.coalesce("n_leaked_docs", F.lit(0)).cast("long")
        .alias("n_leaked_docs"),
        F.expr("(1000L * coalesce(n_leaked_docs, 0L)) div n_docs")
        .alias("leaked_permille"),
        F.coalesce("sum_hit_shingles", F.lit(0)).cast("long")
        .alias("sum_hit_shingles"),
    )


def _split_cte() -> str:
    """The dataset_split assignment + 4-gram shingles as DuckDB CTEs
    (seed/thresholds restated from ml/mixing.py's constants)."""
    from readur_spark.ml.mixing import (
        SPLIT_SEED, SPLIT_TRAIN_PERMILLE, SPLIT_VAL_PERMILLE,
    )

    gram = "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]"
    return f"""
    WITH u AS (
      SELECT doc_id, text, {SYNTH_URL_SQL} AS url FROM documents
    ),
    sp AS (
      SELECT doc_id, text,
             CASE WHEN b < {SPLIT_TRAIN_PERMILLE} THEN 'train'
                  WHEN b < {SPLIT_VAL_PERMILLE} THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id, text,
               CAST(concat('0x', substr(md5('{SPLIT_SEED}' || url), 1, 15))
                    AS BIGINT) % 1000 AS b
        FROM u
      )
    ),
    t0 AS (
      SELECT doc_id, split, string_split(text, ' ') AS t FROM sp
    ),
    sh AS (
      SELECT doc_id, split,
             unnest(list_distinct(list_transform(
               range(1, len(t) - 2), i -> {gram}))) AS g
      FROM t0
    ),
    tr AS (SELECT DISTINCT g FROM sh WHERE split = 'train'),
    hits AS (
      SELECT sh.doc_id, sh.split, count(*) AS n_hit_shingles
      FROM sh JOIN tr USING (g)
      WHERE sh.split <> 'train'
      GROUP BY sh.doc_id, sh.split
    )"""


def _register() -> None:
    @register(
        "split_leakage_docs",
        oracle=_split_cte() + """
    SELECT doc_id, split, CAST(n_hit_shingles AS BIGINT) AS n_hit_shingles
    FROM hits
    """,
    )
    def split_leakage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Val/test documents sharing 4-gram content with the train
        split — the per-document leakage detail, value-hashed (split
        assignment, shingling, and overlap counts replayed)."""
        docs = load(spark, sf_dir, "documents").withColumn(
            "url", synthetic_url()
        )
        return split_leakage_hits(dataset_split(docs))

    @register(
        "split_leakage_rollup",
        oracle=_split_cte() + """
    , sizes AS (
      SELECT split, count(*) AS n_docs FROM sp WHERE split <> 'train'
      GROUP BY split
    )
    SELECT s.split, CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(l.n_leaked, 0) AS BIGINT) AS n_leaked_docs,
           CAST((1000 * coalesce(l.n_leaked, 0)) // s.n_docs AS BIGINT)
             AS leaked_permille,
           CAST(coalesce(l.sum_hit, 0) AS BIGINT) AS sum_hit_shingles
    FROM sizes s LEFT JOIN (
      SELECT split, count(*) AS n_leaked, sum(n_hit_shingles) AS sum_hit
      FROM hits GROUP BY split
    ) l USING (split)
    """,
    )
    def split_leakage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-split leakage report (val/test doc counts, leaked doc
        counts, permille, total shared shingles) — the gate a training
        run checks before trusting its held-out loss."""
        docs = load(spark, sf_dir, "documents").withColumn(
            "url", synthetic_url()
        )
        return split_leakage_report(dataset_split(docs))


_register()


# ---- composed chain: certify the stratified eval slice ---------------------


def _register_eval_slice() -> None:
    from readur_spark.ml.evalset import _EVAL_ORACLE

    gram = "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]"
    oracle = f"""
    WITH ev AS ({_EVAL_ORACLE}),
    sp AS (
      SELECT d.doc_id, d.text,
             CASE WHEN ev.in_eval THEN 'eval' ELSE 'train' END AS split
      FROM documents d JOIN ev USING (doc_id)
    ),
    t0 AS (
      SELECT doc_id, split, string_split(text, ' ') AS t FROM sp
    ),
    sh AS (
      SELECT doc_id, split,
             unnest(list_distinct(list_transform(
               range(1, len(t) - 2), i -> {gram}))) AS g
      FROM t0
    ),
    tr AS (SELECT DISTINCT g FROM sh WHERE split = 'train'),
    hits AS (
      SELECT sh.doc_id, sh.split, count(*) AS n_hit_shingles
      FROM sh JOIN tr USING (g)
      WHERE sh.split <> 'train'
      GROUP BY sh.doc_id, sh.split
    ),
    sizes AS (
      SELECT split, count(*) AS n_docs FROM sp WHERE split <> 'train'
      GROUP BY split
    )
    SELECT s.split, CAST(s.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(l.n_leaked, 0) AS BIGINT) AS n_leaked_docs,
           CAST((1000 * coalesce(l.n_leaked, 0)) // s.n_docs AS BIGINT)
             AS leaked_permille,
           CAST(coalesce(l.sum_hit, 0) AS BIGINT) AS sum_hit_shingles
    FROM sizes s LEFT JOIN (
      SELECT split, count(*) AS n_leaked, sum(n_hit_shingles) AS sum_hit
      FROM hits GROUP BY split
    ) l USING (split)
    """

    @register("eval_slice_leakage", oracle=oracle)
    def eval_slice_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The composed certification the evalset docstring promises:
        ml/evalset.py's stratified membership becomes the split, and
        the 4-gram leakage report runs over it — quota election,
        seeded ranks, shingling, and the rollup all in ONE DuckDB
        replay. A training run gates on this row before trusting the
        slice's held-out loss."""
        from readur_spark.ml.evalset import stratified_eval_plan

        docs = load(spark, sf_dir, "documents").withColumn(
            "url", synthetic_url()
        )
        plan = stratified_eval_plan(docs)
        tagged = docs.join(plan.select("doc_id", "in_eval"), "doc_id").select(
            "doc_id", "text",
            F.when(F.col("in_eval"), F.lit("eval"))
            .otherwise(F.lit("train")).alias("split"),
        )
        return split_leakage_report(tagged)


_register_eval_slice()
