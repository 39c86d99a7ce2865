"""Information-theoretic corpus health statistics.

Two standard diagnostics every large-corpus curation run publishes:

  1. Per-document unigram ENTROPY (Shannon, bits): near-zero entropy
     flags token-spam ("buy buy buy …"), abnormally high entropy flags
     encoding garbage — the information-theoretic sibling of
     ml/textqc.py's compression-ratio QC (zlib approximates exactly
     this quantity; here it's computed exactly from token counts).

  2. Corpus ZIPF FIT: OLS slope of log(frequency) vs log(rank) over
     the top-K token table. Natural text sits near slope −1 (Zipf's
     law); a collapsing slope after a filtering stage means the stage
     distorted the token distribution (the standard "corpus health"
     regression from the scaling-laws literature).

The reference engine's analogue is its extraction-quality heuristics
(src/ocr/enhanced.rs word/character composition checks); these are the
corpus-statistical generalizations a 10^12-doc pipeline monitors.

Scale design:
  - entropy: one slim explode (doc_id, token-hash is unnecessary —
    counts only), two map-side-combinable aggs; the payload never
    shuffles, and the (doc_id, tok) frame collapses before the
    second shuffle;
  - zipf: one grouped count (map-side combine), a top-K TakeOrdered
    (K rows to one partition — K is a constant), and a single-row
    regr_slope/regr_intercept agg. Nothing corpus-sized crosses a
    second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

ZIPF_TOP_K = 200


def unigram_entropy(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, n_distinct, entropy_bits) per document.
    entropy = -Σ p·log2(p) over the whitespace-token distribution."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        toks.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            # -Σ (c/n) log2(c/n)  ==  log2(n) - (Σ c·log2(c)) / n
            (
                F.log2(F.sum("c"))
                - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
            ).alias("_h"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_distinct",
            F.round(F.col("_h"), 3).alias("entropy_bits"),
        )
    )


def zipf_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = ZIPF_TOP_K,
) -> DataFrame:
    """One-row (n_ranked, slope, intercept) OLS fit of
    log(freq) ~ log(rank) over the corpus's top-K tokens. Rank ties
    break on the token string so the fit is deterministic."""
    freq = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    ranked = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_ranked"),
        F.round(
            F.regr_slope(F.log("freq"), F.log("rank")), 3
        ).alias("slope"),
        F.round(
            F.regr_intercept(F.log("freq"), F.log("rank")), 3
        ).alias("intercept"),
    )


@register(
    "qc_unigram_entropy",
    oracle="""
    WITH t AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 3)
             AS entropy_bits
    FROM t GROUP BY doc_id
    """,
)
def qc_unigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-document unigram entropy, value-hashed: DuckDB replays
    the token counts and the same log2 decomposition."""
    return unigram_entropy(load(spark, sf_dir, "documents"))


@register(
    "token_zipf_fit",
    oracle=f"""
    WITH f AS (
      SELECT tok, count(*) AS freq
      FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY tok
    ),
    r AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
      FROM f
    )
    SELECT count(*) AS n_ranked,
           round(regr_slope(ln(freq), ln(rank)), 3) AS slope,
           round(regr_intercept(ln(freq), ln(rank)), 3) AS intercept
    FROM r WHERE rank <= {ZIPF_TOP_K}
    """,
)
def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf regression over the top-200 token table — rank
    assignment (deterministic tie-break) and the OLS slope/intercept
    value-hashed against DuckDB's regr_* twins."""
    return zipf_fit(load(spark, sf_dir, "documents"))


# ---- n-gram novelty in training order (memorization-risk signal) --------

NOVELTY_SEED = "ep1"  # the same epoch seed ml/mixing.py shuffles with


def ngram_novelty(
    docs: DataFrame,
    *,
    seed: str = NOVELTY_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_col: str = "url",
) -> DataFrame:
    """Per-document NOVEL-GRAM fraction under the engine's own
    deterministic training order (ml/mixing.py's seeded md5 order
    hash): a word-8-gram type is *novel* for the document that sees it
    first in training order; novelty_ufp = 10^6 · novel_types /
    gram_types. The standard "new n-gram rate" curriculum/memorization
    diagnostic: a document whose grams were all seen earlier in the
    epoch contributes repetition, not new evidence — the
    training-order-aware refinement of ml/softdedup.py's (orderless)
    commonness weights.

    Documents with fewer than 8 words have no gram types and are
    excluded (the metric is undefined, and the length gates own short
    docs anyway).

    Scale (10^12 docs): the payload collapses to slim (doc_id, gh)
    pairs at the scan (ml/softdedup.py's projection); first-seen
    election is one map-side-combinable min over (order-hash, doc) —
    the same shuffle the df aggregate would take — and the join back
    is co-partitioned on `gh`. No window over the corpus, no sort."""
    from readur_spark.ml.softdedup import gram_type_hashes

    order_hash = F.conv(
        F.substring(
            F.md5(F.encode(F.concat(F.lit(seed), F.col(key_col)), "UTF-8")),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    order = docs.select(F.col(id_col).alias("doc_id"), order_hash.alias("oh"))
    # persist: the order-tagged pairs feed the first-seen election AND
    # the join back — one explode pass, not two (ml/winnow.py pattern)
    pairs = gram_type_hashes(docs, id_col=id_col, text_col=text_col).join(
        order, "doc_id"
    ).persist()
    first_seen = pairs.groupBy("gh").agg(F.min("oh").alias("first_oh"))
    return (
        pairs.join(first_seen, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_gram_types"),
            F.sum((F.col("oh") == F.col("first_oh")).cast("long")).alias(
                "n_novel"
            ),
        )
        .withColumn(
            "novelty_ufp", F.expr("(1000000L * n_novel) div n_gram_types")
        )
    )


from readur_spark.ml.softdedup import _GRAMS_SQL
from readur_spark.queries.tables import SYNTH_URL_SQL


@register(
    "ngram_novelty_rate",
    oracle=f"""
    WITH u AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ),
    o AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5('{NOVELTY_SEED}' || url), 1, 15))
                  AS BIGINT) AS oh
      FROM u
    ),
    {_GRAMS_SQL},
    pg AS (
      SELECT p.doc_id, p.gh, o.oh FROM pairs p JOIN o USING (doc_id)
    ),
    fs AS (
      SELECT gh, min(oh) AS first_oh FROM pg GROUP BY gh
    )
    SELECT pg.doc_id,
           count(*) AS n_gram_types,
           CAST(sum(CASE WHEN pg.oh = fs.first_oh THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((1000000 * sum(CASE WHEN pg.oh = fs.first_oh
                                    THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS novelty_ufp
    FROM pg JOIN fs USING (gh)
    GROUP BY pg.doc_id
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-8-gram rate per document in the seeded training order —
    order hashes, first-seen election, and the fixed-point rate all
    value-hashed against a DuckDB twin replaying the same md5 order."""
    from readur_spark.queries.tables import synthetic_url

    docs = load(spark, sf_dir, "documents").withColumn(
        "url", synthetic_url()
    )
    return ngram_novelty(docs)


# ---- corpus-level domain diversity (r5s9) ----------------------------------


@register(
    "domain_diversity_by_lang",
    oracle="""
    WITH c AS (
      SELECT lang, source, count(*) AS c FROM documents
      GROUP BY lang, source
    )
    SELECT lang,
           CAST(sum(c) AS BIGINT) AS n_docs,
           count(*) AS n_domains,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 3)
             AS entropy_bits,
           round(pow(2, log2(sum(c)) - sum(c * log2(c)) / sum(c)), 3)
             AS effective_domains
    FROM c GROUP BY lang
    """,
)
def domain_diversity_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language domain-diversity accounting — the data-mixing
    diagnostic: Shannon entropy of the source/domain distribution and
    its exponential, the EFFECTIVE number of domains (a language whose
    tokens all come from three hosts is three-deep no matter how many
    rows it has — domain caps and mixture weights should see that).
    Same log2 decomposition (and 3-decimal publication) as the
    unigram-entropy tier; two map-side-combinable aggregates over a
    slim (lang, source) frame, no payload.

    Scale: the grouped frame is |langs|·|domains| — corpus-statistics
    sized; both aggregations are partial-agg friendly."""
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    h = F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
    return c.groupBy("lang").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_domains"),
        F.round(h, 3).alias("entropy_bits"),
        F.round(F.pow(F.lit(2.0), h), 3).alias("effective_domains"),
    )


# ---- lexical richness (r5s11): Yule's K / Simpson / TTR --------------------


def lexical_richness(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document vocabulary-richness metrics in EXACT integer
    arithmetic (no floats anywhere, so the DuckDB twin matches
    bit-for-bit):

      yule_k_milli  = (10^7 * (S2 - N)) div N^2        (Yule 1944)
      simpson_ppm   = (10^6 * S11) div (N * (N - 1))    (Simpson 1949)
      ttr_milli     = (10^3 * V) div N                  (type/token)

    with N = token count, V = distinct tokens, S2 = Σ c², and
    S11 = Σ c·(c−1) over the per-document whitespace-token counts.
    Yule's K is the classic repeated-text / template-spam signal (K
    explodes when a few tokens dominate); Simpson's index is the
    collision probability of two random tokens; TTR is the cheap
    length-confounded baseline the other two correct for. All three
    are standard corpus-QC columns beside `unigram_entropy`.

    Scale: identical shape to `unigram_entropy` — one slim explode,
    one (doc, tok) count collapse, one map-side-combinable rollup;
    all sums fit int64 (S2 ≤ N² and 10^7·S2 needs N ≤ ~3·10^5 tokens
    per document, far above any post-length-gate page).
    """
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = toks.groupBy(id_col).agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
        F.sum(F.col("c") * (F.col("c") - F.lit(1))).cast("long").alias("s11"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        F.expr("(10000000L * (s2 - n_tokens)) div (n_tokens * n_tokens)")
        .alias("yule_k_milli"),
        F.when(
            F.col("n_tokens") > 1,
            F.expr("(1000000L * s11) div (n_tokens * (n_tokens - 1L))"),
        ).alias("simpson_ppm"),
        F.expr("(1000L * n_distinct) div n_tokens").alias("ttr_milli"),
    )


@register(
    "qc_lexical_richness",
    oracle="""
    WITH t AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id,
                   unnest(regexp_split_to_array(text, '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY doc_id, tok
    ),
    a AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS n_distinct,
             CAST(sum(c * c) AS BIGINT) AS s2,
             CAST(sum(c * (c - 1)) AS BIGINT) AS s11
      FROM t GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST((10000000 * (s2 - n_tokens)) // (n_tokens * n_tokens)
                AS BIGINT) AS yule_k_milli,
           CASE WHEN n_tokens > 1 THEN
             CAST((1000000 * s11) // (n_tokens * (n_tokens - 1))
                  AS BIGINT) END AS simpson_ppm,
           CAST((1000 * n_distinct) // n_tokens AS BIGINT) AS ttr_milli
    FROM a
    """,
)
def qc_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer Yule's K / Simpson collision / TTR per document,
    value-hashed: DuckDB replays the token counts and the identical
    truncating integer arithmetic (HUGEINT intermediates cast back to
    BIGINT).  Reference analogue: the extraction-quality word
    -composition heuristics (src/ocr/enhanced.rs:923-976) generalized
    to corpus-statistical spam signals."""
    return lexical_richness(load(spark, sf_dir, "documents"))
