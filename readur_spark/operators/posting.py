"""Inverted posting-list index — index-accelerated search at scale.

The reference's search rides Postgres GIN indexes over tsvector
(migrations/20250620100000_initial_schema.sql:41-43); a batch engine
scanning 10^12 rows per query needs the same idea materialized as a
table (SURVEY.md §4: "build an explicit posting-list table"):

    postings(token, doc_id, tf)   partitioned/bucketed by token

Build is one explode + aggregate. Query-time, the planner inverts the
work: instead of scanning every document's text, it scans the (tiny)
posting slices for the query terms — a semi/inner join keyed by token
that Catalyst turns into a broadcast of the term list. AND semantics =
per-doc matched-term count equals the term count (the reference's
plainto_tsquery conjunction, src/db/documents/search.rs:100-106);
ranking = sum of tf (the ts_rank approximation of B5).

Scale notes: postings are Zipf-distributed by token — a stop-word's
posting list is ~corpus-sized. The build aggregates (token, doc_id)
pairs (map-side combinable); the query side prunes to the searched
tokens BEFORE any join, so stop-word skew only matters if you search
for stop words. Bucketing the stored table by token makes repeated
queries shuffle-free; df statistics live alongside for selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """docs → postings(token, doc_id, tf). One shuffle (the agg)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def build_postings_english(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """docs → postings(lexeme, doc_id, tf) under the 'english' text
    config (Porter2 stems, Snowball stopwords dropped) — the engine's
    analogue of the reference's GIN index over
    to_tsvector('english', content).

    Dictionary-stemming shape (the only scale-sane one): tokens
    explode JVM-side; the stemmer (Python) runs over the DISTINCT
    token vocabulary only — Zipf means the vocabulary is orders of
    magnitude smaller than the token stream — and the (token → lexeme)
    dictionary broadcast-joins back onto the JVM token stream. The
    payload-scale explode and both aggregates never touch Python."""
    from pyspark.sql.functions import pandas_udf

    from readur_spark.kernels.stem import ENGLISH_STOPWORDS

    tokens = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    # stopword drop is a JVM literal-isin — the Snowball list is ~120
    # words, well inside in-plan literal range
    vocab = (
        tokens.select("token")
        .filter(~F.col("token").isin(sorted(ENGLISH_STOPWORDS)))
        .distinct()
    )

    @pandas_udf("string")
    def stem_tok(toks):
        from readur_spark.kernels.stem import porter2_stem

        return toks.map(porter2_stem)

    dictionary = vocab.withColumn("lexeme", stem_tok(F.col("token")))
    return (
        tokens.join(F.broadcast(dictionary), "token")
        .groupBy(F.col("lexeme").alias("token"), "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def document_frequencies(postings: DataFrame) -> DataFrame:
    """token → df (number of documents containing it)."""
    return postings.groupBy("token").agg(
        F.countDistinct("doc_id").alias("df")
    )


def search_postings_and(postings: DataFrame, terms: list[str]) -> DataFrame:
    """AND-of-terms via the index: returns (doc_id, rank_tf) for docs
    containing every term; rank = total tf over the query terms.

    The literal term list is an in-plan array — the filter prunes the
    postings scan to |terms| slices before the aggregate; no join, one
    partial-aggregatable shuffle."""
    hits = postings.filter(F.col("token").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("token").alias("_n_terms"),
            F.sum("tf").alias("rank_tf"),
        )
        .filter(F.col("_n_terms") == len(terms))
        .select("doc_id", "rank_tf")
    )


def search_postings_tfidf(
    postings: DataFrame, terms: list[str], n_docs: int
) -> DataFrame:
    """AND-of-terms with tf-idf-style rarity ranking from the index.

    Weighting is exact fixed-point integer math — tf × ((N × 10^6) div
    df) — rather than a float ln(N/df): monotone in rarity, but
    bit-identical on every engine (no libm in the ranking path, so the
    oracle can value-hash ranks). `n_docs` is a table statistic (row
    count): at scale it comes from the table's metadata/stats, not a
    scan.

    Plan shape: the term filter prunes the postings scan to |terms|
    slices; the per-term df aggregate is |terms| rows, so its join back
    onto the hits is a broadcast. One partial-aggregatable shuffle on
    doc_id, same as the plain-tf path.
    """
    hits = postings.filter(F.col("token").isin(terms))
    dfreq = hits.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    weight = F.expr("tf * ((%dL * 1000000L) div df)" % n_docs)
    return (
        hits.join(F.broadcast(dfreq), "token")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("token").alias("_n_terms"),
            F.sum(weight).cast("long").alias("rank_fp"),
        )
        .filter(F.col("_n_terms") == len(terms))
        .select("doc_id", "rank_fp")
    )


def log2_sixteenths(df_in: DataFrame, arg_col: str, out_col: str) -> DataFrame:
    """floor(16·log2(arg)) for an integer column arg >= 1, exact —
    the fractional-bit extension of ml/quality_lm.py's int_log2.

    Classic mantissa-squaring algorithm, all integer ops: normalize
    arg to m = (arg·256) div 2^e ∈ [256, 512) (a [1,2) mantissa in
    2^8 units), then 4 rounds of m ← m² div 256 (mantissa² in the
    same units); each round's "did it reach 2?" test is one output
    bit. No libm anywhere, so a SQL twin replays every bit; intended
    for SLIM frames (a |terms|-row idf table) — it is a pure
    projection, but 6 chained column rewrites on a corpus-sized frame
    would deserve a kernel instead."""
    out = df_in.withColumn(
        "_e", F.expr(f"CAST(length(bin({arg_col})) - 1 AS BIGINT)")
    ).withColumn(
        "_m",
        F.expr(f"({arg_col} * 256L) div shiftleft(1L, CAST(_e AS INT))"),
    ).withColumn("_fb", F.lit(0).cast("long"))
    for _ in range(4):
        out = (
            out.withColumn("_m", F.expr("(_m * _m) div 256L"))
            .withColumn(
                "_fb",
                F.expr("_fb * 2L + CASE WHEN _m >= 512 THEN 1L ELSE 0L END"),
            )
            .withColumn(
                "_m", F.expr("CASE WHEN _m >= 512 THEN _m div 2 ELSE _m END")
            )
        )
    return out.withColumn(out_col, F.expr("_e * 16L + _fb")).drop(
        "_e", "_m", "_fb"
    )


def _log2_sixteenths_sql(src_cte: str, arg_col: str, divop: str = "//") -> str:
    """SQL twin of log2_sixteenths as a CTE chain over `src_cte`
    (which must expose `token` and `arg_col`). Emits CTEs _l0.._l4;
    select `sbits` from _l4. `divop` is the engine's integer-division
    operator ('//' DuckDB, 'div' Spark SQL)."""
    d = divop
    steps = [
        f"""_l0 AS (
      SELECT token, length(bin({arg_col})) - 1 AS e,
             ({arg_col} * 256) {d}
               (CAST(1 AS BIGINT) << (length(bin({arg_col})) - 1)) AS m,
             0 AS fb
      FROM {src_cte}
    )"""
    ]
    for i in range(4):
        steps.append(
            f"""_l{i + 1} AS (
      SELECT token, e,
             CASE WHEN (m * m) {d} 256 >= 512
                  THEN ((m * m) {d} 256) {d} 2
                  ELSE (m * m) {d} 256 END AS m,
             fb * 2 + CASE WHEN (m * m) {d} 256 >= 512
                           THEN 1 ELSE 0 END AS fb
      FROM _l{i}
    )"""
        )
    return ",\n    ".join(steps) + ", _lout AS (SELECT token, e * 16 + fb AS sbits FROM _l4)"


def search_postings_bm25(
    postings: DataFrame, terms: list[str], n_docs: int
) -> DataFrame:
    """AND-of-terms ranked by fixed-point Okapi BM25 from the index —
    tf saturation (k1 = 1.2) and document-length normalization
    (b = 0.75), the ranking function the reference's ts_rank
    approximates and every production search engine (Lucene/ES/
    Postgres-rum) actually runs.

    Integer-exact semantics (so the DuckDB oracle value-hashes ranks):
      - k1 = 6/5 and b = 3/4 are exact rationals, so the tf part
          tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        is one fixed-point expression: with dl/avgdl in 10^6 units,
          tfpart_fp = (11·tf·10^12) div (5·(10^6·tf + 3·10^5
                        + (9·dl_ratio_fp) div 10)),
        10^6 = a term at exactly average saturation (tf=1, dl=avgdl);
      - idf is Lucene's log2(1 + (N − df + ½)/(df + ½)) in SIXTEENTH-
        bit granularity via the exact mantissa-squaring log
        (log2_sixteenths above) — no libm. A ubiquitous term (df = N)
        scores exactly 0; common-but-not-universal terms keep a
        fractional-bit weight instead of flooring to 0 the way a
        whole-bit log would.

    Scale: dl (sum of tf per doc) and L (total tokens) are index-build
    statistics — Lucene stores dl as per-doc "norms" for exactly this
    reason; here they are recomputed from the postings frame (one
    map-side-combinable agg) and L collects as a single bounded row.
    The term filter prunes the scan to |terms| posting slices before
    any join; df/idf is a |terms|-row broadcast (the log runs on that
    tiny frame only); the dl join is co-partitioned on doc_id with the
    final agg's shuffle."""
    doclens = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    total_tokens = int(
        doclens.agg(F.sum("dl")).collect()[0][0] or 0
    )  # 1-row scalar: the index's L statistic
    avgdl_mfp = max((1000 * total_tokens) // max(n_docs, 1), 1)
    hits = postings.filter(F.col("token").isin(terms))
    dfreq = (
        hits.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .withColumn(
            "arg",
            F.expr(
                "((%dL - 2L * df + 1L) * 256L) div (2L * df + 1L) + 256L"
                % (2 * n_docs)
            ),
        )
    )
    idf = (
        log2_sixteenths(dfreq, "arg", "sbits")
        # arg = (1 + ratio)·2^8, so sbits − 128 = 16·log2(1 + ratio)
        .withColumn("idf_sbits", F.expr("sbits - 128L"))
        .select("token", "idf_sbits")
    )
    tfpart = F.expr(
        "(11L * tf * 1000000000000L) div (5L * (1000000L * tf + 300000L"
        " + (9L * ((1000000000L * dl) div %dL)) div 10L))" % avgdl_mfp
    )
    return (
        hits.join(F.broadcast(idf), "token")
        .join(doclens, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("token").alias("_n_terms"),
            F.sum(tfpart * F.col("idf_sbits")).cast("long").alias(
                "rank_bm25_fp"
            ),
        )
        .filter(F.col("_n_terms") == len(terms))
        .select("doc_id", "rank_bm25_fp")
    )
