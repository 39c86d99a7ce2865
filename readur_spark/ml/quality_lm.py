"""CCNet-style statistical-LM quality filtering, integer-exact.

The public CCNet / ccnet-data recipe (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data") scores each
document with a language-model perplexity and buckets the corpus into
head / middle / tail quality tiers. This module re-expresses that with
a corpus-trained unigram LM whose surprisal is computed in EXACT
integer arithmetic — `floor(log2(T / (c+1)))` via `length(bin(x)) - 1`
— so the score is bit-identical on every engine (the repo convention:
no libm in oracle-checked ranking paths, see operators/posting.py).

The reference engine (yonasBSD/readur) has no LM filter; its nearest
analogue is the OCR quality gate (src/ocr/enhanced.rs:1487-1558). This
is part of the training-pipeline extension tier.

Scale design (10^12 docs):
  - tokenization is a Catalyst split/explode of a SLIM (doc_id, token)
    projection — the payload never rides through the explode;
  - the vocab is one map-side-combinable wordcount capped to the top
    64 Ki types (ORDER BY count DESC, token — deterministic ties), a
    TakeOrderedAndProject, then BROADCAST back onto the token stream:
    no corpus-side shuffle to look up counts;
  - per-doc scoring is sum/count aggregated on doc_id — tokens of one
    doc are co-located after the explode, so the partial agg collapses
    to ~1 row/doc/partition before the only shuffle (slim longs);
  - the total-token count T is an index-build statistic (one slim agg,
    like the posting index's N); at scale it comes from the vocab
    table's own metadata, not a corpus re-scan.

Semantics: surprisal_bits(t) = floor(log2(T div (c_t + 1))), where c_t
is the corpus count of t inside the capped vocab and 0 for
out-of-vocab types (add-one smoothed, so the argument is >= 0 and
log2 is defined; a singleton vocabulary yields T div (T+1) = 0 bits).
Documents with zero alphabetic tokens carry no LM evidence and are
excluded (they are the C4 gates' job, not the LM's).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

TOKEN_SPLIT_RE = "[^a-z]+"
VOCAB_CAP = 65536
# head/middle/tail thresholds on mean surprisal, in centi-bits/token:
# fluent in-distribution text sits low; gibberish / OOV-heavy text high.
HEAD_MAX_CBITS = 800
MIDDLE_MAX_CBITS = 1100


def tokenize_alpha(text: Column) -> Column:
    """Lowercased alphabetic word array (empties removed)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def int_log2(x: Column) -> Column:
    """floor(log2(x)) for integer x >= 1 via binary-string length —
    exact on every engine, unlike libm log2 near powers of two.
    bin(0) is '0' so x = 0 maps to 0 bits."""
    return (F.length(F.bin(x)) - F.lit(1)).cast("long")


def unigram_vocab(
    toks: DataFrame, cap: int = VOCAB_CAP
) -> tuple[DataFrame, int]:
    """(vocab DataFrame (token, c), total token count T).

    T is the full stream's count (including tail types outside the
    cap) — the model's denominator must cover all evidence. BOTH come
    from ONE grouped (token, c) aggregate: T = sum(c) is a K-row agg
    over the grouped frame (the index-build statistic), never a second
    pass over the corpus token stream. The capped vocab (≤ `cap` rows
    of (string, long)) is collected and rebuilt as a local relation so
    the scoring join broadcasts a literal table — the final query plan
    explodes the corpus exactly once."""
    counts = (
        toks.groupBy("token").agg(F.count("*").alias("c")).persist()
    )
    try:
        total = int(counts.agg(F.sum("c")).first()[0] or 0)
        capped = counts.orderBy(F.col("c").desc(), "token").limit(cap)
        schema = capped.schema
        rows = capped.collect()
    finally:
        counts.unpersist()
    vocab = toks.sparkSession.createDataFrame(rows, schema=schema)
    return vocab, total


def score_unigram_surprisal(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = VOCAB_CAP,
) -> DataFrame:
    """Per-document mean unigram surprisal in centi-bits/token plus a
    CCNet-style head/middle/tail bucket. Output:
    (id_col, n_tokens, sum_bits, mean_cbits, ppl_bucket)."""
    toks = docs.select(
        F.col(id_col), F.explode(tokenize_alpha(F.col(text_col))).alias("token")
    )
    vocab, total = unigram_vocab(toks, cap=vocab_cap)
    # surprisal per token: T div (c+1); OOV has c = 0.
    scored = toks.join(F.broadcast(vocab), "token", "left").select(
        F.col(id_col),
        int_log2(
            F.expr(f"{total}L div (coalesce(c, 0L) + 1L)")
        ).alias("bits"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("bits").alias("sum_bits"),
    )
    mean_cbits = F.expr("(100L * sum_bits) div n_tokens")
    return agg.select(
        id_col,
        "n_tokens",
        "sum_bits",
        mean_cbits.alias("mean_cbits"),
        F.when(mean_cbits < HEAD_MAX_CBITS, "head")
        .when(mean_cbits < MIDDLE_MAX_CBITS, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


# ---- driver-contract query ---------------------------------------------


@register(
    "qc_lm_surprisal_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t.token
      FROM documents,
           UNNEST(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             x -> x <> '')) AS t(token)
    ),
    vocab AS (
      SELECT token, count(*) AS c FROM toks
      GROUP BY token ORDER BY c DESC, token LIMIT {VOCAB_CAP}
    ),
    tot AS (SELECT count(*) AS t FROM toks),
    scored AS (
      SELECT toks.doc_id,
             length(bin((SELECT t FROM tot) // (coalesce(v.c, 0) + 1))) - 1
               AS bits
      FROM toks LEFT JOIN vocab v USING (token)
    ),
    agg AS (
      -- CAST: DuckDB's sum(BIGINT) is HUGEINT; Spark's is long — the
      -- driver's value hash distinguishes them (round-3 red).
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(bits) AS BIGINT) AS sum_bits
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, sum_bits,
           CAST((100 * sum_bits) // n_tokens AS BIGINT) AS mean_cbits,
           CASE WHEN (100 * sum_bits) // n_tokens < {HEAD_MAX_CBITS}
                  THEN 'head'
                WHEN (100 * sum_bits) // n_tokens < {MIDDLE_MAX_CBITS}
                  THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM agg
    """,
)
def qc_lm_surprisal_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram-LM surprisal per document with CCNet
    head/middle/tail buckets, value-hash-checked: the DuckDB twin
    rebuilds the identical capped vocab and integer-log2 scores."""
    docs = load(spark, sf_dir, "documents")
    return score_unigram_surprisal(docs).select(
        "doc_id",
        "n_tokens",
        "sum_bits",
        "mean_cbits",
        "ppl_bucket",
    )


def score_bigram_surprisal(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = VOCAB_CAP,
) -> DataFrame:
    """Per-document mean CONDITIONAL surprisal, bigram model:
    bits(cur | prev) = floor(log2(c(prev) div (c(prev,cur) + 1))),
    integer-exact like the unigram path. A deterministic continuation
    (c_bg = c_prev) scores 0 bits; an unseen bigram after a common
    token scores ~log2(c_prev). Both count tables are derived from the
    bigram stream itself (so c_prev >= c_bg always), capped to the top
    `vocab_cap` entries (count desc, token asc — deterministic ties)
    and broadcast; a context outside the capped prev table scores 0
    bits (no evidence — documented cap semantics, mirrored in the
    oracle). Docs with < 2 alphabetic tokens carry no bigram evidence
    and are excluded.

    Scale: one slim (id, prev, cur) explode; two map-side-combinable
    count aggs whose results broadcast; one partial-agg shuffle on the
    doc id. No libm, no Python."""
    t = tokenize_alpha(F.col(text_col))
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("prev"),
                F.element_at(t, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    bg = docs.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    # ONE pass over the bigram stream builds the full (prev, cur)
    # count table; the context counts are derived from it exactly
    # (c_prev = Σ_cur c(prev, cur)) — no second corpus explode. Both
    # capped tables are ≤ vocab_cap rows, collected and rebuilt as
    # local relations so the scoring joins broadcast literals.
    spark = docs.sparkSession
    bgc_full = (
        bg.groupBy("prev", "cur").agg(F.count("*").alias("c_bg")).persist()
    )
    try:
        bgc_top = (
            bgc_full.orderBy(F.col("c_bg").desc(), "prev", "cur")
            .limit(vocab_cap)
        )
        pc_top = (
            bgc_full.groupBy("prev")
            .agg(F.sum("c_bg").alias("c_prev"))
            .orderBy(F.col("c_prev").desc(), "prev")
            .limit(vocab_cap)
        )
        bgc_schema, pc_schema = bgc_top.schema, pc_top.schema
        bgc_rows, pc_rows = bgc_top.collect(), pc_top.collect()
    finally:
        bgc_full.unpersist()
    bgc = spark.createDataFrame(bgc_rows, schema=bgc_schema)
    pc = spark.createDataFrame(pc_rows, schema=pc_schema)
    scored = (
        bg.join(F.broadcast(pc), "prev", "left")
        .join(F.broadcast(bgc), ["prev", "cur"], "left")
        .select(
            F.col(id_col),
            int_log2(
                F.expr("coalesce(c_prev, 0L) div (coalesce(c_bg, 0L) + 1L)")
            ).alias("bits"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"), F.sum("bits").alias("sum_bits")
    )
    return agg.select(
        id_col,
        "n_bigrams",
        "sum_bits",
        F.expr("(100L * sum_bits) div n_bigrams").alias("mean_cbits"),
    )


@register(
    "qc_lm_bigram_surprisal",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text),
                         '{TOKEN_SPLIT_RE}'), x -> x <> '') AS ts
      FROM documents
    ),
    bg AS (
      SELECT doc_id, ts[r.i] AS prev, ts[r.i + 1] AS cur
      FROM t, UNNEST(range(1, len(ts))) AS r(i)
      WHERE len(ts) >= 2
    ),
    bgc AS (
      SELECT prev, cur, count(*) AS c_bg FROM bg
      GROUP BY prev, cur ORDER BY c_bg DESC, prev, cur LIMIT {VOCAB_CAP}
    ),
    pc AS (
      SELECT prev, count(*) AS c_prev FROM bg
      GROUP BY prev ORDER BY c_prev DESC, prev LIMIT {VOCAB_CAP}
    ),
    scored AS (
      SELECT bg.doc_id,
             length(bin(coalesce(pc.c_prev, 0)
                        // (coalesce(bgc.c_bg, 0) + 1))) - 1 AS bits
      FROM bg
      LEFT JOIN pc USING (prev)
      LEFT JOIN bgc USING (prev, cur)
    )
    -- CAST: DuckDB sum(BIGINT) → HUGEINT vs Spark long (hash-visible)
    SELECT doc_id, count(*) AS n_bigrams,
           CAST(sum(bits) AS BIGINT) AS sum_bits,
           CAST((100 * sum(bits)) // count(*) AS BIGINT) AS mean_cbits
    FROM scored GROUP BY doc_id
    """,
)
def qc_lm_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional surprisal per document — the vocab caps,
    integer log2, and cap semantics all replayed exactly in DuckDB."""
    docs = load(spark, sf_dir, "documents")
    return score_bigram_surprisal(docs).select(
        "doc_id", "n_bigrams", "sum_bits", "mean_cbits"
    )
