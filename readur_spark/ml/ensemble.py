"""Quality-gate agreement diagnostics — the ensemble sanity check.

A curation pipeline stacks many quality gates (C4/Gopher document
rules, readability, repetition/TTR, LM buckets, classifiers …), and
the operational question is never just "what does each gate keep" but
"do they AGREE — and is the agreement more than chance?". Gates that
agree near-perfectly are redundant (drop one, save a pass); gates
that disagree on a large slice mark exactly the documents worth
auditing (FineWeb's ablation methodology does this across its filter
stack). The statistic is Cohen's kappa (Cohen, 1960):

    kappa = (p_o - p_e) / (1 - p_e)

computed here in EXACT integer milli-units straight from the 2×2
contingency counts — with n docs, k1/k2 per-gate keeps, and
po_num = both_keep + both_drop,

    pe_num      = k1·k2 + (n-k1)·(n-k2)
    kappa_milli = 1000·(n·po_num - pe_num) div (n² - pe_num)

so DuckDB replays the whole matrix bit-for-bit (no float enters).

Three gates at the registered operating point, each a pure projection
computed once in a single pass:

  c4   — the LANGUAGE-FREE subset of the C4/Gopher document rules
         (word-count band, mean-word-length band, unique-ratio floor —
         ml/webfilters.py constants; the stopword clause is a
         language model and the synthetic corpus is stopword-free, so
         including it would zero the margin and make every kappa
         vacuous);
  read — Flesch Reading Ease above the 'very_confusing' floor
         (ml/textqc.py readability counts, fre_milli >= 30000);
  ttr  — type-token ratio >= 1/2 (2·n_distinct >= n_words — the
         integer form of the repetition gate, threshold-free of
         float rounding).

Scale design (10^12 docs): all three flags are codegen projections
over one scan; the pair frame is 3 rows per corpus (explode of a
3-element literal array), and the contingency sums are map-side
combinable. This diagnostic costs one corpus pass, total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.textqc import readability_counts
from readur_spark.ml.webfilters import (
    MAX_WORDS,
    MIN_MEAN_WORD_LEN,
    MAX_MEAN_WORD_LEN,
    _QF_MIN_WORDS,
    _QF_UNIQ,
    web_filter_signals,
)
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

FRE_FLOOR_MILLI = 30000  # textqc's 'very_confusing' boundary
# TTR bar at 1/2: splits the synthetic corpus near its median unique
# ratio, so both contingency margins are populated.
TTR_NUM, TTR_DEN = 1, 2


def gate_flags(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Append integer keep flags (g_c4, g_read, g_ttr) in one
    projection."""
    sig = web_filter_signals(
        F.col(text_col), min_words=_QF_MIN_WORDS, min_unique_ratio=_QF_UNIQ
    )
    c4 = (
        (sig["flag_word_count"] == 0)
        & (sig["flag_word_len"] == 0)
        & (sig["flag_repetitive"] == 0)
    ).cast("int")
    c = readability_counts(F.col(text_col))
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    fre = F.when(
        c["n_words"] > 0,
        F.expr("206835L - (1015L * _nw) div _ns - (84600L * _sy) div _nw"),
    )
    return (
        docs.withColumn("_nw", c["n_words"])
        .withColumn("_ns", c["n_sentences"])
        .withColumn("_sy", c["n_syllables"])
        .withColumn("g_c4", c4)
        .withColumn(
            "g_read",
            (F.coalesce(fre, F.lit(0)) >= FRE_FLOOR_MILLI).cast("int"),
        )
        .withColumn(
            "g_ttr",
            (
                F.lit(TTR_DEN) * F.size(F.array_distinct(toks))
                >= F.lit(TTR_NUM) * F.size(toks)
            ).cast("int"),
        )
        .drop("_nw", "_ns", "_sy")
    )


def agreement_matrix(flagged: DataFrame) -> DataFrame:
    """(signal_a, signal_b, n, n_both_keep, n_both_drop, n_disagree,
    agree_milli, kappa_milli) for the three gate pairs."""
    pairs = F.array(
        F.struct(
            F.lit("c4").alias("a"), F.lit("read").alias("b"),
            F.col("g_c4").alias("fa"), F.col("g_read").alias("fb"),
        ),
        F.struct(
            F.lit("c4").alias("a"), F.lit("ttr").alias("b"),
            F.col("g_c4").alias("fa"), F.col("g_ttr").alias("fb"),
        ),
        F.struct(
            F.lit("read").alias("a"), F.lit("ttr").alias("b"),
            F.col("g_read").alias("fa"), F.col("g_ttr").alias("fb"),
        ),
    )
    long = flagged.select(F.explode(pairs).alias("p")).select(
        F.col("p.a").alias("signal_a"),
        F.col("p.b").alias("signal_b"),
        F.col("p.fa").alias("fa"),
        F.col("p.fb").alias("fb"),
    )
    agg = long.groupBy("signal_a", "signal_b").agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("fa") * F.col("fb"))).cast("long").alias("n_both_keep"),
        F.sum(((1 - F.col("fa")) * (1 - F.col("fb"))))
        .cast("long").alias("n_both_drop"),
        F.sum("fa").cast("long").alias("_k1"),
        F.sum("fb").cast("long").alias("_k2"),
    )
    return agg.select(
        "signal_a", "signal_b", "n", "n_both_keep", "n_both_drop",
        (F.col("n") - F.col("n_both_keep") - F.col("n_both_drop"))
        .cast("long").alias("n_disagree"),
        F.expr("(1000L * (n_both_keep + n_both_drop)) div n").alias(
            "agree_milli"
        ),
        F.expr(
            "(1000L * (n * (n_both_keep + n_both_drop)"
            " - (_k1 * _k2 + (n - _k1) * (n - _k2))))"
            " div greatest(n * n - (_k1 * _k2 + (n - _k1) * (n - _k2)), 1L)"
        ).alias("kappa_milli"),
    )


@register(
    "qc_gate_agreement",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(regexp_replace(text, '\\s+', '', 'g')) AS alpha_chars,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS ltoks,
             greatest(1, len(regexp_extract_all(text, '[.!?]+')))
               AS n_sentences
      FROM documents
    ),
    flags AS (
      SELECT doc_id,
        CAST((len(toks) BETWEEN {_QF_MIN_WORDS} AND {MAX_WORDS})
             AND (CAST(alpha_chars AS DOUBLE) / len(toks)
                  BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN})
             AND CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                   >= {_QF_UNIQ} AS INT) AS fc4,
        CAST(CASE WHEN len(ltoks) > 0 THEN
               206835 - (1015 * len(ltoks)) // n_sentences
               - (84600 * list_sum(list_transform(ltoks, w -> greatest(1,
                   len(list_filter(regexp_split_to_array(w, '[^aeiouy]+'),
                                   x -> x <> ''))
                   - CAST(w LIKE '%e' AND
                          len(list_filter(regexp_split_to_array(w,
                              '[^aeiouy]+'), x -> x <> '')) >= 2
                          AS INT))))) // len(ltoks)
             ELSE 0 END >= {FRE_FLOOR_MILLI} AS INT) AS fread,
        CAST({TTR_DEN} * len(list_distinct(toks)) >= len(toks) AS INT)
          AS fttr
      FROM t
    ),
    pairs AS (
      SELECT 'c4' AS signal_a, 'read' AS signal_b, fc4 AS fa, fread AS fb
      FROM flags
      UNION ALL
      SELECT 'c4', 'ttr', fc4, fttr FROM flags
      UNION ALL
      SELECT 'read', 'ttr', fread, fttr FROM flags
    ),
    agg AS (
      SELECT signal_a, signal_b, count(*) AS n,
             sum(fa * fb) AS bk, sum((1 - fa) * (1 - fb)) AS bd,
             sum(fa) AS k1, sum(fb) AS k2
      FROM pairs GROUP BY signal_a, signal_b
    )
    SELECT signal_a, signal_b,
           CAST(n AS BIGINT) AS n,
           CAST(bk AS BIGINT) AS n_both_keep,
           CAST(bd AS BIGINT) AS n_both_drop,
           CAST(n - bk - bd AS BIGINT) AS n_disagree,
           CAST((1000 * (bk + bd)) // n AS BIGINT) AS agree_milli,
           CAST((1000 * (n * (bk + bd) - (k1 * k2 + (n - k1) * (n - k2))))
                // greatest(n * n - (k1 * k2 + (n - k1) * (n - k2)), 1)
                AS BIGINT) AS kappa_milli
    FROM agg
    """,
)
def qc_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise agreement + exact integer Cohen's kappa across the
    three registered quality gates — flags, contingency counts, and
    the kappa arithmetic all replayed by DuckDB."""
    flagged = gate_flags(load(spark, sf_dir, "documents"))
    return agreement_matrix(flagged)
