"""Text QC for training-data pipelines: token counting, quality
scoring, language heuristics, fingerprinting.

All four are Catalyst expressions (JVM-side; no Python) — the
reference's A18/A31 semantics generalized to corpus QC
(src/metadata_extraction.rs:139-178, src/ocr/enhanced.rs:1487-1558).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.kernels.textmeta import ENGLISH_WORDS
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def token_count(col: Column) -> Column:
    """Whitespace token count (A31 main path) as an expression."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, 0).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


@register(
    "qc_token_count",
    oracle="""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
)
def qc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


@register(
    "qc_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             length(replace(text, ' ', '')) AS alpha_chars,
             length(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           round(CAST(len(list_filter(toks,
                 x -> list_contains(['the','and','or','but','in','on','at','to','for','of','with','by'], x)))
                 AS DOUBLE) / len(toks), 3) AS stopword_ratio,
           round(CAST(alpha_chars AS DOUBLE) / len(toks), 3) AS avg_token_len,
           round(CAST(alpha_chars AS DOUBLE) / n_chars, 3) AS density
    FROM t
    """,
)
def qc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals: stopword ratio (the reference's 12-word English
    list), mean token length, non-space density."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(w) for w in ENGLISH_WORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    alpha_chars = F.length(F.regexp_replace("text", " ", ""))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(n_stop.cast("double") / F.size(toks), 3).alias("stopword_ratio"),
        F.round(alpha_chars.cast("double") / F.size(toks), 3).alias("avg_token_len"),
        F.round(alpha_chars.cast("double") / F.length("text"), 3).alias("density"),
    )


@register(
    "qc_langid_english",
    oracle="""
    SELECT doc_id, lang,
           (len(string_split(lower(text), 'the')) - 1
          + len(string_split(lower(text), 'and')) - 1
          + len(string_split(lower(text), 'or')) - 1
          + len(string_split(lower(text), 'but')) - 1
          + len(string_split(lower(text), 'in')) - 1
          + len(string_split(lower(text), 'on')) - 1
          + len(string_split(lower(text), 'at')) - 1
          + len(string_split(lower(text), 'to')) - 1
          + len(string_split(lower(text), 'for')) - 1
          + len(string_split(lower(text), 'of')) - 1
          + len(string_split(lower(text), 'with')) - 1
          + len(string_split(lower(text), 'by')) - 1)
           > len(string_split(text, ' ')) // 20 AS likely_english
    FROM documents
    """,
)
def qc_langid_english(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A18's language heuristic verbatim
    (src/metadata_extraction.rs:168-175): *substring* occurrences of 12
    common English words > word_count/20."""
    docs = load(spark, sf_dir, "documents")
    lowered = F.lower(F.col("text"))
    counts = None
    for w in ENGLISH_WORDS:
        c = F.size(F.split(lowered, w, -1)) - 1
        counts = c if counts is None else counts + c
    word_count = F.size(F.split(F.col("text"), " "))
    return docs.select(
        "doc_id",
        "lang",
        (counts > F.floor(word_count / F.lit(20)).cast("int")).alias("likely_english"),
    )


@register(
    "qc_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bigram
      FROM t
    ), bc AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
    ), rep AS (
      SELECT doc_id, max(c) AS top_bigram_count,
             CAST(sum(c) AS BIGINT) AS n_bigrams
      FROM bc GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.toks) AS n_tokens,
           COALESCE(rep.top_bigram_count, 0) AS top_bigram_count,
           round(CASE WHEN rep.n_bigrams > 0
                      THEN CAST(rep.top_bigram_count AS DOUBLE) / rep.n_bigrams
                      ELSE 0 END, 3) AS rep_ratio,
           round(CAST(len(list_distinct(t.toks)) AS DOUBLE) / len(t.toks), 3)
             AS distinct_ratio
    FROM t LEFT JOIN rep ON t.doc_id = rep.doc_id
    """,
)
def qc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (the Gopher-rules family): fraction of
    bigrams taken by the most frequent bigram, and distinct-token
    ratio — the standard boilerplate/spam filters for web-corpus
    curation. Shape: explode → two map-side-combinable aggs keyed by
    (doc, bigram) then doc — no joins over payloads, uniform keys."""
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.array_join(F.slice(t, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select("doc_id", F.explode(bigrams).alias("bigram"))
    counts = base.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    rep = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"), F.sum("c").alias("n_bigrams")
    )
    tok = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
    )
    return tok.join(rep, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("top_bigram_count", F.lit(0)).alias("top_bigram_count"),
        F.round(
            F.when(
                F.col("n_bigrams") > 0,
                F.col("top_bigram_count").cast("double") / F.col("n_bigrams"),
            ).otherwise(0.0),
            3,
        ).alias("rep_ratio"),
        F.round(F.col("n_distinct").cast("double") / F.col("n_tokens"), 3).alias(
            "distinct_ratio"
        ),
    )


@register(
    "qc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def qc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase
    text (the exact-dup key after normalization; rolling-hash winnowing
    lives in ml/dedup simhash)."""
    docs = load(spark, sf_dir, "documents")
    normed = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    return docs.select("doc_id", F.md5(normed).alias("fingerprint"))


def approx_distinct_tokens(
    docs: DataFrame, text_col: str = "text", rsd: float = 0.02
) -> DataFrame:
    """Distinct-token cardinality per lang via HyperLogLog++
    (`approx_count_distinct`, relative error ~rsd) next to the exact
    count. The sketch is the 10^12-row answer: fixed-size state
    (~1.5/rsd^2 bytes) merged map-side, one shuffle of sketches — the
    exact countDistinct re-shuffles every token and exists here only
    as the pytest yardstick."""
    toks = docs.select(
        "lang", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return toks.groupBy("lang").agg(
        F.approx_count_distinct("tok", rsd).alias("approx_distinct"),
        F.countDistinct("tok").alias("exact_distinct"),
    )


@register("approx_distinct_tokens")
def approx_distinct_tokens_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch vs exact (rows-only driver check — a sketch has no
    SQL-exact oracle; the ±5% bound is pinned in pytest)."""
    return approx_distinct_tokens(load(spark, sf_dir, "documents"))


# BPE-ish pre-tokenizer: letter runs | digit runs | single
# non-alnum-non-space (a lookahead-free simplification of the GPT-2
# pre-tokenizer split, in the Java-regex ∩ RE2 subset so the oracle
# runs the identical pattern).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(col: Column) -> Column:
    """Sub-word-ish token count ("don't" → 3, "v2.1" → 4): the
    pre-tokenization granularity LLM token budgets are estimated at,
    vs token_count's whitespace words. Pure Catalyst (regexp_extract_all
    + size) — stays in codegen."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))


@register(
    "qc_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text || ' v2.1, eta-42 (beta)', '{BPE_TOKEN_RE}'))
             AS n_bpe_tokens,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_ws_tokens
    FROM documents
    """,
)
def qc_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish vs whitespace token counts side by side (the corpus is
    punctuation-free word soup, so a deterministic mixed-content tail
    is appended — same expression in the oracle — to exercise the
    digit/punctuation branches)."""
    docs = load(spark, sf_dir, "documents")
    seeded = F.concat(F.col("text"), F.lit(" v2.1, eta-42 (beta)"))
    return docs.select(
        "doc_id",
        token_count_bpe(seeded).alias("n_bpe_tokens"),
        token_count(F.col("text")).alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# script detection (unicode-range char classes)
# ---------------------------------------------------------------------------

# literal-character ranges (not \u escapes) so the IDENTICAL pattern
# string runs under Java regex and RE2/DuckDB
_SCRIPT_RANGES = {
    "latin": "[A-Za-z]",
    "cyrillic": "[Ѐ-ӿ]",
    "cjk": "[一-鿿]",
    "arabic": "[؀-ۿ]",
}


def script_fractions(text: Column) -> dict[str, Column]:
    """Per-script character fractions + dominant script — the signal
    behind 'route to the right tokenizer / drop mixed-garbage pages'.
    Pure codegen: each class is a regexp_replace length delta over the
    scan; no shuffle."""
    total = F.length(F.regexp_replace(text, r"\s+", ""))
    counts = {
        name: F.length(text) - F.length(F.regexp_replace(text, pat, ""))
        for name, pat in _SCRIPT_RANGES.items()
    }
    out: dict[str, Column] = {}
    for name, cnt in counts.items():
        out["frac_" + name] = F.round(
            F.when(total > 0, cnt.cast("double") / total).otherwise(0.0), 3
        )
    dominant = F.lit("other")
    best = F.lit(0)
    for name, cnt in counts.items():
        better = cnt > best
        dominant = F.when(better, name).otherwise(dominant)
        best = F.when(better, cnt).otherwise(best)
    out["dominant_script"] = dominant
    return out


@register(
    "qc_script_detect",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0 THEN ' привет мир снова'
                          WHEN doc_id % 3 = 1 THEN ' 你好世界你好世界'
                          ELSE ' hello again friend' END AS t
      FROM documents
    ), c AS (
      SELECT doc_id, t,
             length(regexp_replace(t, '\\s+', '', 'g')) AS total,
             length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')) AS n_latin,
             length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '', 'g')) AS n_cyr,
             length(t) - length(regexp_replace(t, '[一-鿿]', '', 'g')) AS n_cjk,
             length(t) - length(regexp_replace(t, '[؀-ۿ]', '', 'g')) AS n_ar
      FROM seeded
    )
    SELECT doc_id,
           round(CASE WHEN total > 0 THEN CAST(n_latin AS DOUBLE)/total ELSE 0 END, 3) AS frac_latin,
           round(CASE WHEN total > 0 THEN CAST(n_cyr AS DOUBLE)/total ELSE 0 END, 3) AS frac_cyrillic,
           round(CASE WHEN total > 0 THEN CAST(n_cjk AS DOUBLE)/total ELSE 0 END, 3) AS frac_cjk,
           round(CASE WHEN total > 0 THEN CAST(n_ar AS DOUBLE)/total ELSE 0 END, 3) AS frac_arabic,
           CASE
             WHEN n_ar > 0 AND n_ar > n_latin AND n_ar > n_cyr AND n_ar > n_cjk THEN 'arabic'
             WHEN n_cjk > 0 AND n_cjk > n_latin AND n_cjk > n_cyr THEN 'cjk'
             WHEN n_cyr > 0 AND n_cyr > n_latin THEN 'cyrillic'
             WHEN n_latin > 0 THEN 'latin'
             ELSE 'other' END AS dominant_script
    FROM c
    """,
)
def qc_script_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script fractions over the corpus with a deterministic
    mixed-script tail (the base corpus is pure ASCII; the tail — same
    expression in the oracle — exercises the Cyrillic/CJK branches)."""
    docs = load(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, " привет мир снова")
        .when(F.col("doc_id") % 3 == 1, " 你好世界你好世界")
        .otherwise(" hello again friend"),
    )
    sig = script_fractions(seeded)
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in sig.items()]
    )


@register(
    "heavy_hitter_tokens",
    oracle="""
    WITH toks AS (
      SELECT lang, t.token
      FROM documents,
           UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS t(token)
    ),
    counts AS (
      SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token
    ),
    ranked AS (
      SELECT lang, token, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, token) AS rnk
      FROM counts
    )
    SELECT lang, token, n, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens per language (vocabulary head — the exact
    aggregate a count-min sketch approximates at stream scale; batch
    side it is one map-side-combinable count + a per-lang top-K
    window over the SLIM (lang, token, n) aggregate, never the token
    stream). Deterministic ties (count desc, token asc)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("token"),
    )
    counts = toks.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "token")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
        .select("lang", "token", "n", "rnk")
    )


# ---- compression-ratio quality signal --------------------------------------


def compression_ratio_table(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """(id, n_bytes, n_compressed, ratio_centi) — zlib compressibility
    as a quality signal (the Dolma/Gopher-family heuristic): highly
    repetitive boilerplate compresses far below natural prose
    (ratio << 30), while random/encrypted gibberish barely compresses
    (ratio ~100+). Deterministic for a fixed zlib level; ratio_centi =
    (100 * n_compressed) div n_bytes, integer-exact.

    Arrow-batched pandas UDF (zlib is C-speed; one payload pass, no
    shuffle). Not SQL-expressible — pinned by pytest, not an oracle."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    # lambda form: module-level `from __future__ import annotations`
    # stringifies hints, which pandas_udf cannot resolve for locals
    comp_len = pandas_udf(
        lambda texts: texts.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
            if t is not None
            else 0
        ),
        "long",
    )

    nb = F.length(F.encode(F.col(text_col), "UTF-8")).cast("long")
    return (
        docs.select(F.col(id_col), F.col(text_col))
        .withColumn("n_bytes", nb)
        .filter(F.col("n_bytes") > 0)
        .withColumn("n_compressed", comp_len(F.col(text_col)))
        .select(
            id_col,
            "n_bytes",
            "n_compressed",
            F.expr("(100L * n_compressed) div n_bytes").alias("ratio_centi"),
        )
    )


@register("qc_compression_ratio")
def qc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compressibility per document (rows-only: no zlib in SQL;
    determinism + the boilerplate-vs-gibberish ordering are pinned in
    tests/test_textqc_extra.py)."""
    docs = load(spark, sf_dir, "documents")
    return compression_ratio_table(docs)


# ---- readability (Flesch/Flesch-Kincaid), integer-exact ----------------

# milli-scaled coefficient forms of the published formulas:
#   FK grade  = 0.39 (W/S) + 11.8 (Syl/W) - 15.59
#   FRE score = 206.835 - 1.015 (W/S) - 84.6 (Syl/W)
# computed as (a*W) div S etc. so every engine floors identically.


def _syllables(word: Column) -> Column:
    """Heuristic syllable count of one lowercase word: vowel-group
    runs ([aeiouy]+), minus one for a silent trailing 'e' when another
    group exists, floored at 1. Pure string expressions — usable
    inside array HOFs (stays in whole-stage codegen)."""
    groups = F.size(
        F.filter(F.split(word, "[^aeiouy]+"), lambda x: x != F.lit(""))
    )
    silent_e = (word.endswith("e") & (groups >= 2)).cast("int")
    return F.greatest(F.lit(1), groups - silent_e)


def readability_counts(text: Column) -> dict[str, Column]:
    """Per-document readability base counts, all codegen, zero
    shuffle. Syllables are summed with F.aggregate over the token
    array — the corpus never explodes. Sentences are [.!?]+ runs,
    floored at 1 (a fragment is one sentence)."""
    toks = F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda x: x != F.lit("")
    )
    n_words = F.size(toks)
    n_sentences = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(text, F.lit("[.!?]+"), 0))
    )
    n_syllables = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + _syllables(w)
    )
    return {
        "n_words": n_words.cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "n_syllables": n_syllables.cast("long"),
    }


def readability_table(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_words, n_sentences, n_syllables, fk_milligrade,
    fre_milli, fre_band) — FK grade and Flesch Reading Ease in
    milli-units via integer div (engine-exact). Zero-word docs carry
    no readability evidence and are excluded."""
    c = readability_counts(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        c["n_words"].alias("n_words"),
        c["n_sentences"].alias("n_sentences"),
        c["n_syllables"].alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    fre = F.expr(
        "206835L - (1015L * n_words) div n_sentences"
        " - (84600L * n_syllables) div n_words"
    )
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "(390L * n_words) div n_sentences"
            " + (11800L * n_syllables) div n_words - 15590L"
        ).alias("fk_milligrade"),
        fre.alias("fre_milli"),
        F.when(fre >= 90000, "very_easy")
        .when(fre >= 60000, "standard")
        .when(fre >= 30000, "difficult")
        .otherwise("very_confusing")
        .alias("fre_band"),
    )


@register(
    "qc_readability",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))
               AS n_sentences
      FROM documents
    ), c AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(n_sentences AS BIGINT) AS n_sentences,
             CAST(list_sum(list_transform(toks, w -> greatest(1,
               len(list_filter(regexp_split_to_array(w, '[^aeiouy]+'),
                               x -> x <> ''))
               - CAST(w LIKE '%e' AND
                      len(list_filter(regexp_split_to_array(w,
                          '[^aeiouy]+'), x -> x <> '')) >= 2 AS INT))))
               AS BIGINT) AS n_syllables
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST((390 * n_words) // n_sentences
                + (11800 * n_syllables) // n_words - 15590 AS BIGINT)
             AS fk_milligrade,
           CAST(206835 - (1015 * n_words) // n_sentences
                - (84600 * n_syllables) // n_words AS BIGINT) AS fre_milli,
           CASE WHEN 206835 - (1015 * n_words) // n_sentences
                     - (84600 * n_syllables) // n_words >= 90000
                  THEN 'very_easy'
                WHEN 206835 - (1015 * n_words) // n_sentences
                     - (84600 * n_syllables) // n_words >= 60000
                  THEN 'standard'
                WHEN 206835 - (1015 * n_words) // n_sentences
                     - (84600 * n_syllables) // n_words >= 30000
                  THEN 'difficult'
                ELSE 'very_confusing' END AS fre_band
    FROM c
    """,
)
def qc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade + Flesch Reading Ease per document in
    exact milli-units — syllable heuristic, integer div scoring, and
    bands replayed identically in DuckDB."""
    docs = load(spark, sf_dir, "documents")
    return readability_table(docs)


# ---- count-min sketch heavy hitters (r5s5) ---------------------------------

CMS_W = 1024  # counter width per hash row
CMS_D = 3     # independent hash rows
CMS_TOPK = 20


def _cms_bucket(tok, i: int):
    # md5-derived bucket, the _synthetic_edges cross-engine trick:
    # both engines hash the same "token#i" bytes to the same counter.
    return (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(tok, F.lit(f"#{i}")), "UTF-8")),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


def cms_heavy_hitters(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = CMS_TOPK,
) -> DataFrame:
    """Heavy hitters via a Count-Min sketch (Cormode & Muthukrishnan
    2005): d=3 hash rows of w=1024 counters, estimate = min over rows,
    one-sided error (estimate >= true count, over by at most eN/w with
    prob 1-exp(-d)). The sketch is the 100 TB answer to heavy-hitter
    queries: the counter table is w·d integers REGARDLESS of corpus
    size, map-side combinable, and mergeable across shards/streams by
    plain addition — where the exact twin (`heavy_hitter_tokens`)
    shuffles the full (token, n) vocabulary.

    Returns the top-k tokens by ESTIMATE with the exact count
    alongside (est >= n_exact always; equality whenever the token's d
    buckets are collision-free). Fully deterministic — the md5 hash
    family is fixed — so DuckDB replays counters, estimates, and the
    top-k election value-for-value."""
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("token")
    )
    ib = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    _cms_bucket(F.col("token"), i).alias("b"),
                )
                for i in range(1, CMS_D + 1)
            ]
        )
    ).alias("ib")
    counters = (
        toks.select(ib)
        .select("ib.i", "ib.b")
        .groupBy("i", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    cand = exact.select("token", "n_exact", ib).select(
        "token", "n_exact", "ib.i", "ib.b"
    )
    est = (
        cand.join(counters, ["i", "b"])
        .groupBy("token", "n_exact")
        .agg(F.min("c").cast("long").alias("est"))
    )
    # top-k via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps + driver merge), NOT a row_number window over one
    # partition; the residual rank window runs on the k-row remnant.
    from pyspark.sql import Window

    topk = est.orderBy(F.col("est").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("est").desc(), F.col("token"))
    return topk.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    ).select("token", "est", "n_exact", "rnk")


def _cms_bucket_sql(tok: str, i: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5({tok} || '#{i}'), 1, 15)) AS BIGINT)"
        f" % {CMS_W}"
    )


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH toks AS (
      SELECT t.token
      FROM documents,
           UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS t(token)
    ),
    ib AS (
      SELECT token, i.i,
             CASE i.i
               {" ".join(f"WHEN {i} THEN {_cms_bucket_sql('token', i)}" for i in range(1, CMS_D + 1))}
             END AS b
      FROM toks, UNNEST(range(1, {CMS_D + 1})) AS i(i)
    ),
    counters AS (
      SELECT i, b, count(*) AS c FROM ib GROUP BY i, b
    ),
    exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS n_exact
      FROM toks GROUP BY token
    ),
    cand AS (
      SELECT e.token, e.n_exact, i.i,
             CASE i.i
               {" ".join(f"WHEN {i} THEN {_cms_bucket_sql('e.token', i)}" for i in range(1, CMS_D + 1))}
             END AS b
      FROM exact e, UNNEST(range(1, {CMS_D + 1})) AS i(i)
    ),
    est AS (
      SELECT cand.token, cand.n_exact, CAST(min(c.c) AS BIGINT) AS est
      FROM cand JOIN counters c USING (i, b)
      GROUP BY cand.token, cand.n_exact
    )
    SELECT token, est, n_exact, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT *, row_number() OVER (ORDER BY est DESC, token) AS rnk
      FROM est
    ) WHERE rnk <= {CMS_TOPK}
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over the corpus token stream — counter
    table, per-token min-estimates, and the deterministic top-k
    election all value-hashed against the DuckDB replay."""
    return cms_heavy_hitters(load(spark, sf_dir, "documents"))
