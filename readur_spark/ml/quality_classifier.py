"""Fasttext-style statistical quality classifier, integer-exact.

The standard web-pipeline recipe (CCNet's fasttext langid stage; the
LLaMA "looks-like-a-Wikipedia-reference" page classifier; DSIR's
hashed-feature importance weights, `ml/dsir.py`) trains a cheap linear
text classifier on weak labels and scores the whole corpus with it.
This module re-expresses that as a multinomial Naive Bayes classifier
whose training IS one map-side-combinable aggregation and whose
scoring is one broadcast join — the two Spark shapes that survive a
10^12-document corpus.

Here the weak labels come from the repo's own C4/Gopher document
gates (`ml/webfilters.py: web_filter_signals().keep`): the classifier
distills the hand-written rules into per-token statistics that
generalize beyond them (exactly how production pipelines bootstrap a
quality classifier before human labels exist). Any 0/1 label column
works — the trainer is label-agnostic.

All arithmetic follows the repo's integer-exact ranking convention
(`operators/posting.py`, `ml/quality_lm.py`): per-class surprisal is
`floor(log2(T_class div (c_class + 1)))` computed via
`length(bin(x)) - 1`, no libm anywhere, so the DuckDB oracle replays
the scores bit-for-bit. The log-likelihood-ratio of a token is the
difference of its two class surprisals; a document's score is the
token sum — ±1-bit per-token quantization averages out over the
document, which is all a head/tail quality split needs.

The reference engine (yonasBSD/readur) has no statistical classifier;
its nearest analogue is the boolean OCR-quality gate
(src/ocr/enhanced.rs:1487-1558). Training-pipeline extension tier.

Scale design (10^12 docs):
  - training is ONE groupBy over a slim (token, label) projection —
    per-token class counts partial-aggregate map-side, so the only
    shuffle carries ~|vocab| rows, not the corpus;
  - class totals T_pos/T_neg are K-row aggregates over that grouped
    frame (the single-pass convention from quality_lm's round-3 fix —
    never a second corpus pass);
  - the capped model (≤ vocab_cap rows of (token, llr_bits)) is
    collected and rebuilt as a local relation, so scoring broadcasts
    a literal table and the scoring plan explodes the corpus once;
  - per-doc aggregation happens where the explode left the tokens —
    partial agg collapses to ~1 row/doc/partition before the one
    slim shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.ml.quality_lm import int_log2, tokenize_alpha
from readur_spark.ml.webfilters import (
    _QF_MIN_WORDS,
    _QF_UNIQ,
    _STOP_SQL,
    MAX_MEAN_WORD_LEN,
    MAX_WORDS,
    MIN_MEAN_WORD_LEN,
    MIN_STOPWORD_HITS,
    web_filter_signals,
)
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

VOCAB_CAP = 65536


def train_nb_llr(
    toks: DataFrame, *, vocab_cap: int = VOCAB_CAP
) -> tuple[DataFrame, int]:
    """Train the classifier from a (token, label) stream.

    Returns (model, prior_bits): `model` is a ≤ vocab_cap local-
    relation DataFrame (token, llr_bits) where
      llr_bits(t) = bits_neg(t) - bits_pos(t),
      bits_cls(t) = floor(log2(T_cls div (c_cls(t) + 1)))
    (positive llr → the token is evidence FOR the positive class);
    `prior_bits` is the per-token OOV correction
    floor(log2(T_neg+1)) - floor(log2(T_pos+1)) — what an unseen
    token scores, folded in so scoring's left join can default to 0.

    ONE grouped (token, c_pos, c_neg) aggregate feeds the class
    totals, the cap, and the model — the token stream is scanned
    exactly once during training.
    """
    counts = (
        toks.groupBy("token")
        .agg(
            F.sum(F.col("label").cast("long")).alias("c_pos"),
            F.count("*").alias("c_all"),
        )
        .withColumn("c_neg", F.col("c_all") - F.col("c_pos"))
        .persist()
    )
    try:
        tot = counts.agg(
            F.sum("c_pos").alias("tp"), F.sum("c_neg").alias("tn")
        ).first()
        t_pos, t_neg = int(tot["tp"] or 0), int(tot["tn"] or 0)
        capped = (
            counts.orderBy(F.col("c_all").desc(), "token")
            .limit(vocab_cap)
            .select(
                "token",
                (
                    int_log2(F.expr(f"{t_neg}L div (c_neg + 1L)"))
                    - int_log2(F.expr(f"{t_pos}L div (c_pos + 1L)"))
                ).alias("llr_bits"),
            )
        )
        schema = capped.schema
        rows = capped.collect()
    finally:
        counts.unpersist()
    # OOV: both classes see c = 0, so the token scores the prior ratio.
    prior_bits = int(t_neg + 1).bit_length() - 1 - (
        int(t_pos + 1).bit_length() - 1
    )
    model = toks.sparkSession.createDataFrame(rows, schema=schema)
    return model, prior_bits


def score_nb(
    docs: DataFrame,
    model: DataFrame,
    prior_bits: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents with a trained (token, llr_bits) model.

    Output: (id_col, n_tokens, sum_llr, mean_cllr, predicted) —
    mean_cllr in integer centi-bits/token, predicted = mean_cllr > 0.
    Docs with zero alphabetic tokens carry no evidence and are
    excluded (the document gates own that decision)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(tokenize_alpha(F.col(text_col))).alias("token"),
    )
    scored = toks.join(F.broadcast(model), "token", "left").select(
        F.col(id_col),
        F.coalesce(F.col("llr_bits"), F.lit(prior_bits)).alias("llr"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("llr").alias("sum_llr"),
    )
    mean_cllr = F.expr("(100L * sum_llr) div n_tokens")
    return agg.select(
        id_col,
        "n_tokens",
        "sum_llr",
        mean_cllr.alias("mean_cllr"),
        (mean_cllr > 0).cast("int").alias("predicted"),
    )


def nb_confusion(scored: DataFrame, labels: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """2×2 confusion rollup of predictions vs the weak labels —
    (label, predicted, n). A slim join on the id; the payload is
    untouched."""
    return (
        scored.join(labels.select(id_col, "label"), id_col)
        .groupBy("label", "predicted")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _gate_labels(docs: DataFrame) -> DataFrame:
    """(doc_id, label) from the fixture-operating-point C4/Gopher
    gates. The stopword rule is left out of the training label: the
    gate's 12-word list has at most ONE distinct hit anywhere in the
    synthetic corpus, so including it collapses the positives to a
    single class and a one-class NB is vacuous (the rule still runs in
    qc_web_filters — it just carries no training signal here)."""
    sig = web_filter_signals(
        F.col("text"), min_words=_QF_MIN_WORDS, min_unique_ratio=_QF_UNIQ
    )
    label = (
        (sig["flag_word_count"] == 0)
        & (sig["flag_word_len"] == 0)
        & (sig["flag_repetitive"] == 0)
    )
    return docs.select("doc_id", "text", label.cast("int").alias("label"))


# The oracle rebuilds the label, the per-token class counts, the capped
# model, and the integer-log2 scores — the whole train+score round trip
# value-hashed.
_NB_ORACLE = f"""
WITH lab AS (
  SELECT doc_id, text,
         CAST((len(toks) BETWEEN {_QF_MIN_WORDS} AND {MAX_WORDS})
              AND (CAST(alpha_chars AS DOUBLE) / len(toks)
                   BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
              AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                  >= {_QF_UNIQ} AS INT) AS label
  FROM (
    SELECT doc_id, text,
           regexp_split_to_array(trim(text), '\\s+') AS toks,
           length(regexp_replace(text, '\\s+', '', 'g')) AS alpha_chars
    FROM documents
  )
),
toks AS (
  SELECT doc_id, label, t.token
  FROM lab,
       UNNEST(list_filter(
         regexp_split_to_array(lower(text), '[^a-z]+'),
         x -> x <> '')) AS t(token)
),
counts AS (
  SELECT token,
         CAST(sum(label) AS BIGINT) AS c_pos,
         count(*) AS c_all,
         count(*) - CAST(sum(label) AS BIGINT) AS c_neg
  FROM toks GROUP BY token
),
tot AS (
  SELECT CAST(sum(c_pos) AS BIGINT) AS t_pos,
         CAST(sum(c_neg) AS BIGINT) AS t_neg
  FROM counts
),
model AS (
  SELECT token,
         (length(bin((SELECT t_neg FROM tot) // (c_neg + 1))) - 1)
         - (length(bin((SELECT t_pos FROM tot) // (c_pos + 1))) - 1)
           AS llr_bits
  FROM counts ORDER BY c_all DESC, token LIMIT {VOCAB_CAP}
),
prior AS (
  SELECT (length(bin(t_neg + 1)) - 1) - (length(bin(t_pos + 1)) - 1)
           AS prior_bits
  FROM tot
),
scored AS (
  SELECT toks.doc_id, toks.label,
         coalesce(m.llr_bits, (SELECT prior_bits FROM prior)) AS llr
  FROM toks LEFT JOIN model m USING (token)
),
agg AS (
  SELECT doc_id, any_value(label) AS label, count(*) AS n_tokens,
         CAST(sum(llr) AS BIGINT) AS sum_llr
  FROM scored GROUP BY doc_id
)
SELECT doc_id, label, n_tokens, sum_llr,
       CAST((100 * sum_llr) // n_tokens AS BIGINT) AS mean_cllr,
       CAST((100 * sum_llr) // n_tokens > 0 AS INT) AS predicted
FROM agg
"""


@register("qc_nb_classifier", oracle=_NB_ORACLE)
def qc_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the gate-distilled Naive Bayes quality classifier on the
    corpus and score every document — counts, caps, integer-log2 LLRs,
    and predictions all replayed exactly in DuckDB.

    Fixture note: the synthetic corpus draws every document from ONE
    shared vocabulary, and the 3-gate label keys on length/uniqueness,
    not token identity — so there is deliberately ~no lexical signal
    here and per-doc scores sit near the decision boundary (that the
    full train+score round trip is still value-hash-exact is the
    point of this query). `tests/test_quality_classifier.py` pins the
    discriminative behavior on a corpus whose classes DO differ
    lexically: there the classifier separates them perfectly."""
    docs = load(spark, sf_dir, "documents")
    labeled = _gate_labels(docs)
    toks = labeled.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )
    model, prior_bits = train_nb_llr(toks)
    scored = score_nb(labeled, model, prior_bits)
    return scored.join(
        labeled.select("doc_id", "label"), "doc_id"
    ).select("doc_id", "label", "n_tokens", "sum_llr", "mean_cllr", "predicted")


# ---- quality-aware domain capping --------------------------------------

TOPK_PER_DOMAIN = 20


_DOMAIN_TOPK_ORACLE = _NB_ORACLE.replace(
        """SELECT doc_id, label, n_tokens, sum_llr,
       CAST((100 * sum_llr) // n_tokens AS BIGINT) AS mean_cllr,
       CAST((100 * sum_llr) // n_tokens > 0 AS INT) AS predicted
FROM agg""",
        """, ranked AS (
  SELECT agg.doc_id,
         d.source || '.example' AS domain,
         CAST((100 * sum_llr) // n_tokens AS BIGINT) AS mean_cllr,
         CAST(row_number() OVER (
           PARTITION BY d.source
           ORDER BY (100 * sum_llr) // n_tokens DESC, agg.doc_id
         ) AS BIGINT) AS rank
  FROM agg JOIN documents d USING (doc_id)
)
SELECT doc_id, domain, mean_cllr, rank
FROM ranked WHERE rank <= 20""",
)


@register("domain_topk_quality", oracle=_DOMAIN_TOPK_ORACLE)
def domain_topk_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware domain capping: keep the TOPK_PER_DOMAIN best
    documents of each domain by classifier score (deterministic
    doc_id tie-break) — the quality-ranked alternative to
    `ml/urlfilters.py`'s content-addressed cap, and what a crawl
    budget allocator actually wants ("this host gets 50 slots: take
    its best 50, not a hash sample"). One slim window over
    (domain, score) — the payload is untouched.

    Scale note: the window partitions by domain, so a mega-domain's
    scores land in one task — for the handful of hosts above ~10^7
    docs, pre-filter with a per-domain score-threshold agg (two-pass
    top-k) before the window; at the registered operating point the
    single window is the right plan."""
    docs = load(spark, sf_dir, "documents")
    labeled = _gate_labels(docs)
    toks = labeled.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )
    model, prior_bits = train_nb_llr(toks)
    scored = score_nb(labeled, model, prior_bits)
    from pyspark.sql import Window

    ranked = scored.join(
        docs.select(
            "doc_id",
            F.concat(F.col("source"), F.lit(".example")).alias("domain"),
            F.col("source"),
        ),
        "doc_id",
    ).withColumn(
        "rank",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.col("mean_cllr").desc(), "doc_id"
            )
        )
        .cast("long"),
    )
    return ranked.filter(F.col("rank") <= TOPK_PER_DOMAIN).select(
        "doc_id", "domain", "mean_cllr", "rank"
    )


# ---- per-language percentile calibration (FineWeb-style thresholds) -----

PCTILE_KEEP_UFP = 500_000  # keep the top half of each language


@register(
    "quality_percentile_by_lang",
    oracle=_NB_ORACLE.replace(
        """SELECT doc_id, label, n_tokens, sum_llr,
       CAST((100 * sum_llr) // n_tokens AS BIGINT) AS mean_cllr,
       CAST((100 * sum_llr) // n_tokens > 0 AS INT) AS predicted
FROM agg""",
        """, ranked AS (
  SELECT agg.doc_id, d.lang,
         CAST((100 * sum_llr) // n_tokens AS BIGINT) AS mean_cllr,
         row_number() OVER (
           PARTITION BY d.lang
           ORDER BY (100 * sum_llr) // n_tokens, agg.doc_id) AS rn,
         count(*) OVER (PARTITION BY d.lang) AS nl
  FROM agg JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, mean_cllr,
       CAST(((rn - 1) * 1000000) // greatest(nl - 1, 1) AS BIGINT)
         AS pctile_ufp,
       CAST(((rn - 1) * 1000000) // greatest(nl - 1, 1) >= 500000 AS INT)
         AS keep_top_half
FROM ranked""",
    ),
)
def quality_percentile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-rank the classifier score WITHIN each language and
    gate on the percentile, not the raw score — the FineWeb(-2)
    calibration trick: absolute quality scores aren't comparable
    across languages (different stopword densities, different token
    inventories), so each language keeps its own top fraction.
    pctile_ufp = 10^6·(rank−1)/(n_lang−1) with deterministic
    (score, doc_id) ordering; keep = top half.

    Scale: one slim window per language over (lang, score) — same
    plan family as domain_topk_quality, and the same mega-partition
    note applies (pre-aggregate a threshold for languages above ~10^7
    docs). The payload never enters the window."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    labeled = _gate_labels(docs)
    toks = labeled.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )
    model, prior_bits = train_nb_llr(toks)
    scored = score_nb(labeled, model, prior_bits)
    joined = scored.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("mean_cllr", "doc_id")
    wl = Window.partitionBy("lang")
    pct = F.expr(
        "((rn - 1L) * 1000000L) div greatest(nl - 1L, 1L)"
    )
    return (
        joined.withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn("nl", F.count(F.lit(1)).over(wl).cast("long"))
        .select(
            "doc_id",
            "lang",
            "mean_cllr",
            pct.alias("pctile_ufp"),
            (pct >= PCTILE_KEEP_UFP).cast("int").alias("keep_top_half"),
        )
    )


@register("domain_topk_quality_salted", oracle=_DOMAIN_TOPK_ORACLE)
def domain_topk_quality_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """domain_topk_quality through the SALTED two-phase top-k
    (operators/partitioning.py: topk_per_group_salted) — IDENTICAL
    output (the oracle is shared verbatim with the single-window
    form), mega-domain-safe plan: phase 1 windows over
    (domain, doc_id % 16) so no task ever holds a whole domain's rows;
    phase 2 ranks the ≤ 16·k survivors. This is the scale path the
    single-window variant's docstring promises for hosts above ~10^7
    documents."""
    from readur_spark.operators.partitioning import topk_per_group_salted

    docs = load(spark, sf_dir, "documents")
    labeled = _gate_labels(docs)
    toks = labeled.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )
    model, prior_bits = train_nb_llr(toks)
    scored = score_nb(labeled, model, prior_bits)
    joined = scored.join(
        docs.select(
            "doc_id",
            F.concat(F.col("source"), F.lit(".example")).alias("domain"),
        ),
        "doc_id",
    )
    ranked = topk_per_group_salted(
        joined,
        ["domain"],
        [F.col("mean_cllr").desc(), F.col("doc_id")],
        TOPK_PER_DOMAIN,
        salt_expr=F.col("doc_id") % 16,
    )
    return ranked.select("doc_id", "domain", "mean_cllr", "rank")


# ---- per-language threshold election via score histogram (scale path) ---


@register(
    "quality_threshold_by_lang",
    oracle=_NB_ORACLE.replace(
        """SELECT doc_id, label, n_tokens, sum_llr,
       CAST((100 * sum_llr) // n_tokens AS BIGINT) AS mean_cllr,
       CAST((100 * sum_llr) // n_tokens > 0 AS INT) AS predicted
FROM agg""",
        """, sc AS (
  SELECT d.lang, CAST((100 * sum_llr) // n_tokens AS BIGINT) AS s
  FROM agg JOIN documents d USING (doc_id)
), hist AS (
  SELECT lang, s, count(*) AS cnt FROM sc GROUP BY lang, s
), cum AS (
  SELECT lang, s, cnt,
         sum(cnt) OVER (PARTITION BY lang ORDER BY s DESC) AS c_ge,
         sum(cnt) OVER (PARTITION BY lang) AS n_l
  FROM hist
)
SELECT lang,
       CAST(max(n_l) AS BIGINT) AS n_scored,
       CAST(max(CASE WHEN c_ge >= (n_l + 1) // 2 THEN s END) AS BIGINT)
         AS threshold_ccllr,
       CAST(min(CASE WHEN c_ge >= (n_l + 1) // 2 THEN c_ge END) AS BIGINT)
         AS n_kept
FROM cum GROUP BY lang""",
    ),
)
def quality_threshold_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language median-score threshold elected from the SCORE
    HISTOGRAM — the mega-partition-safe twin of
    quality_percentile_by_lang. A percent-rank window puts a whole
    language (half the corpus, for 'en') in one task; the histogram
    path aggregates (lang, score) counts first — mean_cllr is integer
    centi-bits, so the histogram is a few hundred rows per language
    regardless of corpus size — and elects the smallest score whose
    from-the-top cumulative count covers ceil(n/2). Gate docs with
    `mean_cllr >= threshold_ccllr` via a broadcast of this table; kept
    fraction is ≥ 50 % (score ties keep together — threshold
    semantics, not exact rank semantics).

    Output: (lang, n_scored, threshold_ccllr, n_kept), value-hashed."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    labeled = _gate_labels(docs)
    toks = labeled.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )
    model, prior_bits = train_nb_llr(toks)
    scored = score_nb(labeled, model, prior_bits)
    hist = (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", F.col("mean_cllr").alias("s"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_ge = (
        Window.partitionBy("lang")
        .orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("c_ge", F.sum("cnt").over(w_ge)).withColumn(
        "n_l", F.sum("cnt").over(Window.partitionBy("lang"))
    )
    covered = F.when(
        F.col("c_ge") >= F.expr("(n_l + 1L) div 2L"), F.col("s")
    )
    kept = F.when(
        F.col("c_ge") >= F.expr("(n_l + 1L) div 2L"), F.col("c_ge")
    )
    return cum.groupBy("lang").agg(
        F.max("n_l").cast("long").alias("n_scored"),
        F.max(covered).cast("long").alias("threshold_ccllr"),
        F.min(kept).cast("long").alias("n_kept"),
    )


# ---- reliability table (score calibration, r5s11) --------------------------

RELIA_BIN_W = 25     # centi-bits/token per bin
RELIA_BIN_LO = -8    # clamp range → 16 bins
RELIA_BIN_HI = 7


def reliability_table(scored_labeled: DataFrame) -> DataFrame:
    """(bin, n_docs, n_pos, pos_permille) — the reliability-diagram
    table over LLR score bins: empirical positive rate per clamped
    mean_cllr bin. A well-calibrated (even just monotone) scorer shows
    pos_permille rising with bin; a flat table means the score carries
    no label signal at that operating point. Exact integers
    throughout; one slim aggregation over the (doc, label, score)
    frame."""
    # mean_cllr can be negative and Spark's `div` truncates while
    # DuckDB's `//` floors — shift into the non-negative domain first
    # (|mean_cllr| ≤ 100·max|llr| ≪ 10000) so both engines floor.
    binned = scored_labeled.withColumn(
        "bin",
        F.expr(
            f"greatest({RELIA_BIN_LO}L, least({RELIA_BIN_HI}L, "
            f"((mean_cllr + 10000L) div {RELIA_BIN_W}) - "
            f"{10000 // RELIA_BIN_W}L))"
        ),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("label").cast("long").alias("n_pos"),
    ).select(
        "bin",
        "n_docs",
        "n_pos",
        F.expr("(1000L * n_pos) div n_docs").alias("pos_permille"),
    )


_RELIA_ORACLE = f"""
WITH nb AS (
{_NB_ORACLE}
), binned AS (
  SELECT greatest({RELIA_BIN_LO}, least({RELIA_BIN_HI},
           ((mean_cllr + 10000) // {RELIA_BIN_W}) - {10000 // RELIA_BIN_W}))
           AS bin,
         label
  FROM nb
)
SELECT CAST(bin AS BIGINT) AS bin,
       count(*) AS n_docs,
       CAST(sum(label) AS BIGINT) AS n_pos,
       CAST((1000 * sum(label)) // count(*) AS BIGINT) AS pos_permille
FROM binned GROUP BY bin
"""


@register("nb_reliability_table", oracle=_RELIA_ORACLE)
def nb_reliability_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of the gate-distilled NB scorer: the FULL NB
    oracle (labels, counts, capped model, integer-log2 scores) replays
    as a CTE and the per-bin positive rates are value-hashed on top —
    the calibration diagnostic every production quality gate ships
    with its classifier."""
    docs = load(spark, sf_dir, "documents")
    labeled = _gate_labels(docs)
    toks = labeled.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )
    model, prior_bits = train_nb_llr(toks)
    scored = score_nb(labeled, model, prior_bits).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    return reliability_table(scored)


# ---- isotonic calibration (exact minimax PAV, r5s11) -----------------------


def isotonic_calibration(relia: DataFrame) -> DataFrame:
    """(bin, n_docs, n_pos, pos_permille, iso_permille) — the isotonic
    (monotone non-decreasing) calibration of the reliability table,
    via the exact minimax identity for PAV (Robertson et al., "Order
    Restricted Statistical Inference"):

        iso(i) = max_{j≤i} min_{k≥i} pool(j, k),
        pool(j, k) = Σ n_pos[j..k] / Σ n_docs[j..k]

    — the closed form of pool-adjacent-violators, needing no
    sequential merging, so it runs as two window ranks over the
    (i, j, k) triple frame.  Pool fractions are ORDERED by their
    IEEE-double value (identical in both engines) with deterministic
    index tie-breaks; the published iso_permille is the exact integer
    floor of the chosen pool fraction.  O(B³) triples — B is a
     16-bucket constant, so the frame is ≤ ~700 rows regardless of
    corpus size (everything corpus-sized already collapsed into the
    reliability table's one aggregation)."""
    bins = relia.select("bin", "n_docs", "n_pos")
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    pref = bins.select(
        "bin",
        F.sum("n_docs").over(w).alias("pn"),
        F.sum("n_pos").over(w).alias("pp"),
    )
    # pools (j, k): prefix differences via a self-join on ordered
    # bins; the inclusive-prefix difference pp[k] − pp[j] excludes
    # bin j itself, so add bin j's own counts back
    lo = pref.join(
        bins.withColumnRenamed("bin", "_b"),
        pref["bin"] == F.col("_b"),
    ).select(
        F.col("bin").alias("j"),
        F.col("pn").alias("pn_j"),
        F.col("pp").alias("pp_j"),
        F.col("n_pos").alias("pos_j"),
        F.col("n_docs").alias("n_j"),
    )
    hi = pref.select(
        F.col("bin").alias("k"),
        F.col("pn").alias("pn_k"),
        F.col("pp").alias("pp_k"),
    )
    pools = (
        lo.crossJoin(hi)
        .filter(F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (F.col("pp_k") - F.col("pp_j") + F.col("pos_j")).alias(
                "pos_jk"
            ),
            (F.col("pn_k") - F.col("pn_j") + F.col("n_j")).alias("n_jk"),
        )
    )
    idx = bins.select(F.col("bin").alias("i"))
    trip = idx.crossJoin(pools).filter(
        (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i"))
    )
    frac = (F.col("pos_jk").cast("double") / F.col("n_jk").cast("double"))
    inner_w = Window.partitionBy("i", "j").orderBy(
        frac.asc(), F.col("k").asc()
    )
    inner = trip.withColumn("rn", F.row_number().over(inner_w)).filter(
        F.col("rn") == 1
    )
    outer_w = Window.partitionBy("i").orderBy(frac.desc(), F.col("j").asc())
    chosen = inner.withColumn("rm", F.row_number().over(outer_w)).filter(
        F.col("rm") == 1
    )
    return (
        chosen.select(
            F.col("i").alias("bin"),
            F.expr("(1000L * pos_jk) div n_jk").alias("iso_permille"),
        )
        .join(relia, "bin")
        .select(
            "bin", "n_docs", "n_pos", "pos_permille", "iso_permille"
        )
    )


_ISO_ORACLE = f"""
WITH relia AS (
{_RELIA_ORACLE}
), pref AS (
  SELECT bin,
         sum(n_docs) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS pn,
         sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS pp,
         n_docs, n_pos
  FROM relia
), pools AS (
  SELECT l.bin AS j, h.bin AS k,
         CAST(h.pp - l.pp + l.n_pos AS BIGINT) AS pos_jk,
         CAST(h.pn - l.pn + l.n_docs AS BIGINT) AS n_jk
  FROM pref l CROSS JOIN pref h
  WHERE l.bin <= h.bin
), trip AS (
  SELECT i.bin AS i, p.j, p.k, p.pos_jk, p.n_jk
  FROM (SELECT bin FROM relia) i CROSS JOIN pools p
  WHERE p.j <= i.bin AND p.k >= i.bin
), inner_min AS (
  SELECT *, row_number() OVER (
    PARTITION BY i, j
    ORDER BY CAST(pos_jk AS DOUBLE) / CAST(n_jk AS DOUBLE) ASC, k ASC)
    AS rn
  FROM trip
), outer_max AS (
  SELECT *, row_number() OVER (
    PARTITION BY i
    ORDER BY CAST(pos_jk AS DOUBLE) / CAST(n_jk AS DOUBLE) DESC, j ASC)
    AS rm
  FROM inner_min WHERE rn = 1
)
SELECT r.bin, r.n_docs, r.n_pos, r.pos_permille,
       CAST((1000 * o.pos_jk) // o.n_jk AS BIGINT) AS iso_permille
FROM outer_max o JOIN relia r ON o.i = r.bin
WHERE o.rm = 1
"""


@register("nb_isotonic_calibration", oracle=_ISO_ORACLE)
def nb_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the NB scorer's reliability table — the
    FULL NB oracle and the reliability rollup replay as CTEs, then
    DuckDB re-derives every (j,k) pool and both minimax ranks. The
    published iso_permille column is monotone non-decreasing in the
    score bin by construction."""
    docs = load(spark, sf_dir, "documents")
    labeled = _gate_labels(docs)
    toks = labeled.select(
        "label", F.explode(tokenize_alpha(F.col("text"))).alias("token")
    )
    model, prior_bits = train_nb_llr(toks)
    scored = score_nb(labeled, model, prior_bits).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    return isotonic_calibration(reliability_table(scored))
