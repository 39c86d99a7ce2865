"""Benchmark decontamination and site-template boilerplate detection.

Two corpus-hygiene operators every pretraining pipeline runs between
extraction and training:

* **Decontamination** (`contamination_hits`): flag documents sharing
  word-n-gram shingles with a held-out evaluation set (the standard
  13-gram check of GPT-3 appendix C / PaLM, here parameterized). The
  eval shingle set is tiny relative to the corpus — millions of
  shingles vs 10^12 documents — so it broadcasts, and the plan is
  scan → explode shingles → broadcast semi-join → per-doc count:
  no corpus-side shuffle except the final doc_id aggregate.
* **Site-template detection** (`site_boilerplate_shingles`): per-site
  shingles whose document frequency within the site exceeds a
  threshold — the CCNet/RefinedWeb line-dedup idea at shingle
  granularity. Shuffle keys are (site, shingle); df-counting is
  map-side combinable, and the per-site totals are a slim broadcast
  back onto the candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def word_shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles of a text column (pure Catalyst:
    transform over slice starts; same construction as ml/dedup.py)."""
    t = F.split(text, " ")
    n_out = F.size(t) - (n - 1)
    return F.array_distinct(
        F.when(
            n_out >= 1,
            F.transform(
                F.sequence(F.lit(1), n_out),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def contamination_hits(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
) -> DataFrame:
    """Per-document count of distinct shingles shared with the eval
    set. Only contaminated docs are returned (inner join)."""
    # shingles travel as xxhash64 longs: the broadcast set, the join
    # comparisons, and the exploded corpus rows all shrink ~4-8× vs
    # carrying 5-word strings (collision odds at 2^64 are negligible
    # beside the false-positive rate of n-gram matching itself)
    ev = (
        eval_docs.select(
            F.explode(word_shingles(F.col(text_col), n_shingle)).alias("s")
        )
        .select(F.xxhash64("s").alias("hs"))
        .distinct()
    )
    # partition-floor (same idiom as the MinHash signature stage): a
    # single-split input file would otherwise run the whole shingle
    # explode + hash on one task
    slim = corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col)).repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    sh = slim.select(
        "doc_id",
        F.explode(word_shingles(F.col(text_col), n_shingle)).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("hs"))
    return (
        sh.join(F.broadcast(ev), "hs")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_shingles"))
    )


@register(
    "decontaminate_overlap",
    oracle="""
    WITH t0 AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(t) - 3),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                    || t[i+3] || ' ' || t[i+4]
             ))) AS s
      FROM t0
    ), ev AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
    )
    SELECT sh.doc_id,
           count(*) AS n_hit_shingles,
           CAST(max(CASE WHEN sh.doc_id % 97 = 0 THEN 1 ELSE 0 END) AS INT)
             AS is_eval
    FROM sh JOIN ev USING (s)
    GROUP BY sh.doc_id
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-gram overlap against a held-out eval slice (doc_id % 97):
    eval docs self-flag (is_eval=1) and genuinely-overlapping corpus
    docs surface alongside them."""
    docs = load(spark, sf_dir, "documents")
    hits = contamination_hits(docs, docs.filter(F.col("doc_id") % 97 == 0))
    return hits.withColumn(
        "is_eval", (F.col("doc_id") % 97 == 0).cast("int")
    )


def site_boilerplate_shingles(
    docs: DataFrame,
    *,
    site_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shingle: int = 5,
    min_frac: float = 0.6,
    min_site_docs: int = 5,
) -> DataFrame:
    """Shingles appearing in ≥ min_frac of a site's documents —
    template/boilerplate candidates for stripping. Detection only; the
    strip step is a broadcast filter of these shingle runs out of each
    site's token stream.

    Sites with fewer than `min_site_docs` documents are excluded: a
    1-2-doc site (the crawl long tail) trivially has frac ≈ 1.0 for
    ALL its content, and stripping it would delete whole documents."""
    sh = docs.select(
        F.col(site_col).alias("site"),
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n_shingle)).alias("s"),
    )
    per_site = (
        docs.groupBy(F.col(site_col).alias("site"))
        .agg(F.countDistinct(id_col).alias("n_site_docs"))
        .filter(F.col("n_site_docs") >= min_site_docs)
    )
    freq = sh.groupBy("site", "s").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    return (
        freq.join(F.broadcast(per_site), "site")
        .withColumn(
            "frac", F.col("n_docs_with") / F.col("n_site_docs")
        )
        .filter(F.col("frac") >= min_frac)
        .select(
            "site", "s", "n_docs_with", "n_site_docs",
            F.round("frac", 3).alias("frac_r"),
        )
    )


@register(
    "site_boilerplate",
    oracle="""
    WITH seeded AS (
      SELECT doc_id, source,
             'welcome to ' || source || ' portal home news ' || text
               || ' copyright ' || source || ' all rights reserved' AS t
      FROM documents
    ), t0 AS (
      SELECT doc_id, source, string_split(t, ' ') AS tk FROM seeded
    ), sh AS (
      SELECT source AS site, doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(tk) - 3),
               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                    || tk[i+3] || ' ' || tk[i+4]
             ))) AS s
      FROM t0
    ), per_site AS (
      SELECT source AS site, count(DISTINCT doc_id) AS n_site_docs
      FROM seeded GROUP BY source
      HAVING count(DISTINCT doc_id) >= 5
    ), freq AS (
      SELECT site, s, count(DISTINCT doc_id) AS n_docs_with
      FROM sh GROUP BY site, s
    )
    SELECT freq.site, s, n_docs_with, n_site_docs,
           round(CAST(n_docs_with AS DOUBLE) / n_site_docs, 3) AS frac_r
    FROM freq JOIN per_site ON freq.site = per_site.site
    WHERE CAST(n_docs_with AS DOUBLE) / n_site_docs >= 0.6
    """,
)
def site_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template detection on a seeded corpus: every doc of a site gets
    the site's header/footer sentence (same expression in the oracle);
    the detector must recover exactly those shingle runs per site while
    the body text stays below threshold."""
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("welcome to "), F.col("source"),
            F.lit(" portal home news "), F.col("text"),
            F.lit(" copyright "), F.col("source"),
            F.lit(" all rights reserved"),
        ).alias("text"),
    )
    return site_boilerplate_shingles(seeded)
