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


def repeated_ngram_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 20,
) -> DataFrame:
    """Exact substring dedup, Spark-shaped (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal token span whose n-grams also occur in ANOTHER
    document. The suffix-array formulation doesn't distribute; the
    equivalent n-gram formulation does:

      explode (doc, pos, xxhash64(n-gram)) → count distinct docs per
      gram (map-side combinable) → keep grams in ≥2 docs → merge each
      doc's hit positions into maximal spans (gaps-and-islands window,
      per-doc — embarrassingly parallel).

    Output: (doc_id, span_start, span_end) in 1-based token indices,
    spans covering [start, end] inclusive of full n-gram extents.
    """
    from pyspark.sql.window import Window

    t = F.split(F.col(text_col), " ")
    n_out = F.size(t) - (n - 1)
    grams = F.when(
        n_out >= 1,
        F.transform(
            F.sequence(F.lit(1), n_out),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.array_join(F.slice(t, i, n), " ")).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>"))
    slim = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)).repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    )
    exploded = slim.select(
        "doc_id", F.explode(grams).alias("g")
    ).select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))

    repeated = (
        exploded.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = exploded.join(repeated, "h").select("doc_id", "pos")

    # gaps-and-islands: hit n-grams at pos p cover [p, p+n-1]; merge
    # overlapping/adjacent covers into maximal spans
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + (n - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "new_span",
        F.when(
            prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "span_id",
        F.sum("new_span").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (n - 1)).alias("span_end"),
        )
        .drop("span_id")
    )


@register(
    "repeated_ngram_spans",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 0
                  THEN text || ' alpha beta gamma delta epsilon zeta eta theta'
                       || ' iota kappa lambda mu nu xi omicron pi rho sigma tau'
                       || ' upsilon phi chi psi omega'
                  ELSE text END AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, string_split(t, ' ') AS tk FROM seeded
    ), grams AS (
      SELECT doc_id,
             unnest([{'pos': i,
                      's': array_to_string(tk[i:i + 19], ' ')}
                     for i in range(1, greatest(len(tk) - 19, 0) + 1)],
                    recursive := true)
      FROM toks
    ), rep AS (
      SELECT s FROM grams GROUP BY s HAVING count(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos FROM grams g SEMI JOIN rep USING (s)
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN max(pos + 19) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
               OR pos > max(pos + 19) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             THEN 1 ELSE 0 END AS new_span
      FROM hits
    ), numbered AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS span_id
      FROM marked
    )
    SELECT doc_id,
           CAST(min(pos) AS INT) AS span_start,
           CAST(max(pos) + 19 AS INT) AS span_end
    FROM numbered
    GROUP BY doc_id, span_id
    """,
)
def repeated_ngram_spans_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-gram repeated-span detection over a corpus seeded with a
    shared 25-token tail on every 9th doc — the detector must recover
    exactly those tail spans (body text never repeats cross-doc in the
    random corpus), per-row value-hashed."""
    docs = load(spark, sf_dir, "documents")
    shared = (
        " alpha beta gamma delta epsilon zeta eta theta"
        " iota kappa lambda mu nu xi omicron pi rho sigma tau"
        " upsilon phi chi psi omega"
    )
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0, F.concat(F.col("text"), F.lit(shared))
        ).otherwise(F.col("text")).alias("text"),
    )
    out = repeated_ngram_spans(seeded, n=20)
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
    )


def remove_spans(docs: DataFrame, spans: DataFrame,
                 *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Apply substring-dedup decisions: drop every token inside a
    repeated span, keep everything else in order. Pure Catalyst:
    spans collapse to one array per doc (tiny), join back on doc id,
    and a zip_with/filter pass drops covered positions — no explode of
    the token stream, no Python. Docs without spans pass through
    unchanged (left join)."""
    span_arrs = spans.groupBy(F.col(id_col).alias("_id")).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("span_end").alias("e"))
        ).alias("_spans")
    )
    t = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(t))
    kept = F.filter(
        F.arrays_zip(idx.alias("pos"), t.alias("tok")),
        lambda z: ~F.exists(
            F.col("_spans"),
            lambda sp: (z["pos"] >= sp["s"]) & (z["pos"] <= sp["e"]),
        ),
    )
    cleaned = F.when(
        F.col("_spans").isNull(), F.col(text_col)
    ).otherwise(F.array_join(F.transform(kept, lambda z: z["tok"]), " "))
    return docs.join(span_arrs, docs[id_col] == span_arrs["_id"], "left").drop(
        "_id"
    ).withColumn("cleaned_text", cleaned).drop("_spans")


@register(
    "dedup_substring_clean",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 0
                  THEN text || ' alpha beta gamma delta epsilon zeta eta theta'
                       || ' iota kappa lambda mu nu xi omicron pi rho sigma tau'
                       || ' upsilon phi chi psi omega'
                  ELSE text END AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, string_split(t, ' ') AS tk FROM seeded
    ), grams AS (
      SELECT doc_id,
             unnest([{'pos': i,
                      's': array_to_string(tk[i:i + 19], ' ')}
                     for i in range(1, greatest(len(tk) - 19, 0) + 1)],
                    recursive := true)
      FROM toks
    ), rep AS (
      SELECT s FROM grams GROUP BY s HAVING count(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos FROM grams g SEMI JOIN rep USING (s)
    ), marked AS (
      SELECT doc_id, pos,
             CASE WHEN max(pos + 19) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
               OR pos > max(pos + 19) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             THEN 1 ELSE 0 END AS new_span
      FROM hits
    ), numbered AS (
      SELECT doc_id, pos,
             sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS span_id
      FROM marked
    ), spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 19 AS e
      FROM numbered GROUP BY doc_id, span_id
    ), positions AS (
      SELECT doc_id,
             unnest([{'pos': i, 'tok': tk[i]}
                     for i in range(1, len(tk) + 1)], recursive := true)
      FROM toks
    )
    , kept AS (
      SELECT p.doc_id,
             string_agg(p.tok, ' ' ORDER BY p.pos) AS ct
      FROM positions p
      WHERE NOT EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = p.doc_id AND p.pos BETWEEN sp.s AND sp.e
      )
      GROUP BY p.doc_id
    )
    -- LEFT JOIN keeps docs whose every token was removed (rare but
    -- real: the corpus contains whole short docs repeated inside
    -- longer ones) as empty cleaned_text, matching the engine
    SELECT t.doc_id, coalesce(k.ct, '') AS cleaned_text
    FROM toks t LEFT JOIN kept k USING (doc_id)
    """,
)
def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection + removal composed: seed shared 25-token tails, find
    the repeated 20-gram spans, strip them — every affected doc comes
    back as its original body, byte-for-byte, and untouched docs pass
    through byte-identical."""
    docs = load(spark, sf_dir, "documents")
    shared = (
        " alpha beta gamma delta epsilon zeta eta theta"
        " iota kappa lambda mu nu xi omicron pi rho sigma tau"
        " upsilon phi chi psi omega"
    )
    seeded = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0, F.concat(F.col("text"), F.lit(shared))
        ).otherwise(F.col("text")).alias("text"),
    )
    spans = repeated_ngram_spans(seeded, n=20)
    return remove_spans(seeded, spans).select("doc_id", "cleaned_text")
