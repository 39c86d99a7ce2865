"""Vocabulary coverage curve — corpus coverage as a function of
vocabulary size.

Choosing a tokenizer vocabulary size (BPE's num_merges, SentencePiece
/ unigram-LM's vocab_size, its character_coverage knob) is a coverage
question: what fraction of corpus tokens does the top-V of the type
distribution explain? Zipf's law makes the curve steep then flat, and
the knee is where the published recipes put V. This module computes
the exact curve at power-of-two cutoffs.

The trick that makes it scale is that coverage at a rank cutoff does
NOT require ranking tokens. Types sharing a frequency are
interchangeable for coverage (each contributes exactly f tokens), so
the curve is fully determined by the count-of-counts histogram
(frequency f, number of types m_f) — a frame bounded by the number of
DISTINCT frequency values, which Zipf keeps in the low thousands even
at 10^12 tokens. For cutoff V: take whole frequency classes from the
top until the next class would overflow V, then fill the remaining
r slots from the boundary class at f* tokens each:

  covered(V) = cum_tokens(above f*) + (V - cum_types(above f*)) * f*

All integer, so the DuckDB oracle replays it exactly.

Scale design (10^12 tokens):
  - one map-side-combinable groupBy(token) over the exploded stream;
  - count-of-counts is a second tiny aggregate over the SLIM type
    frame; the only window runs over THAT histogram (distinct
    frequency values, not types, not tokens) — same shuffle class as
    length_histogram_quantiles' "shuffle carries distinct values";
  - cutoffs are a literal array cross-joined against the histogram.

Reference tie-in: the reference sizes nothing by corpus statistics
(its vocabulary is Postgres FTS lexemes, unbounded); this is the
planning query its tokenizer-owning successors (ml/bpe.py,
ml/unigram.py) want answered before picking num_merges/vocab_size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

CUTOFFS = [256, 512, 1024, 2048, 4096, 8192, 16384]


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda x: x != F.lit("")
    )


def count_of_counts(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(n, m) histogram: m types occur exactly n times."""
    counts = docs.select(
        F.explode(_tokens(F.col(text_col))).alias("token")
    ).groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("n").agg(F.count(F.lit(1)).alias("m"))


def coverage_curve(
    cc: DataFrame, cutoffs: list[int] | None = None
) -> DataFrame:
    """(vocab_size, types_used, covered_tokens, coverage_permille)
    from the count-of-counts histogram. The descending cumulative
    window runs over the histogram only (distinct frequency values —
    documented-bounded)."""
    cutoffs = CUTOFFS if cutoffs is None else cutoffs
    w = Window.orderBy(F.col("n").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cc.select(
        "n",
        "m",
        F.sum("m").over(w).alias("cum_types"),
        F.sum(F.col("n") * F.col("m")).over(w).alias("cum_tokens"),
    )
    totals = cc.agg(
        F.sum("m").cast("long").alias("total_types"),
        F.sum(F.col("n") * F.col("m")).cast("long").alias("total_tokens"),
    )
    sizes = cum.sparkSession.createDataFrame(
        [(v,) for v in cutoffs], ["vocab_size"]
    )
    # boundary class: the first (in descending-f order) whose cumsum
    # reaches V — whole classes above it, r = V - cum_types(above)
    # types from it
    bounded = (
        sizes.crossJoin(cum)
        .filter(
            (F.col("cum_types") >= F.col("vocab_size"))
            & (F.col("cum_types") - F.col("m") < F.col("vocab_size"))
        )
        .select(
            "vocab_size",
            F.col("vocab_size").cast("long").alias("types_used"),
            (
                (F.col("cum_tokens") - F.col("n") * F.col("m"))
                + (F.col("vocab_size") - (F.col("cum_types") - F.col("m")))
                * F.col("n")
            ).cast("long").alias("covered_tokens"),
        )
    )
    capped = (
        sizes.crossJoin(F.broadcast(totals))
        .filter(F.col("vocab_size") > F.col("total_types"))
        .select(
            "vocab_size",
            F.col("total_types").alias("types_used"),
            F.col("total_tokens").alias("covered_tokens"),
        )
    )
    out = bounded.unionByName(capped).crossJoin(F.broadcast(totals))
    return out.select(
        F.col("vocab_size").cast("long").alias("vocab_size"),
        "types_used",
        "covered_tokens",
        F.expr("covered_tokens * 1000 div total_tokens").alias(
            "coverage_permille"
        ),
    )


# ---- driver query ----------------------------------------------------------

_CUTOFF_VALUES = ", ".join(f"({v})" for v in CUTOFFS)


@register(
    "vocab_coverage_curve",
    oracle=f"""
    WITH toks AS (
      SELECT t.token
      FROM documents, UNNEST(list_filter(
          regexp_split_to_array(lower(text), '[^a-z]+'),
          x -> x <> '')) AS t(token)
    ),
    counts AS (
      SELECT token, count(*) AS n FROM toks GROUP BY token
    ),
    cc AS (
      SELECT n, count(*) AS m FROM counts GROUP BY n
    ),
    cum AS (
      SELECT n, m,
             sum(m) OVER (ORDER BY n DESC) AS cum_types,
             sum(n * m) OVER (ORDER BY n DESC) AS cum_tokens
      FROM cc
    ),
    totals AS (
      SELECT CAST(sum(m) AS BIGINT) AS total_types,
             CAST(sum(n * m) AS BIGINT) AS total_tokens
      FROM cc
    ),
    sizes(vocab_size) AS (VALUES {_CUTOFF_VALUES}),
    bounded AS (
      SELECT vocab_size,
             CAST(vocab_size AS BIGINT) AS types_used,
             CAST((cum_tokens - n * m)
               + (vocab_size - (cum_types - m)) * n AS BIGINT)
               AS covered_tokens
      FROM sizes, cum
      WHERE cum_types >= vocab_size AND cum_types - m < vocab_size
    ),
    capped AS (
      SELECT vocab_size, total_types AS types_used,
             total_tokens AS covered_tokens
      FROM sizes, totals
      WHERE vocab_size > total_types
    ),
    unioned AS (
      SELECT * FROM bounded UNION ALL SELECT * FROM capped
    )
    SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
           types_used, covered_tokens,
           covered_tokens * 1000 // total_tokens AS coverage_permille
    FROM unioned, totals
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-coverage curve at power-of-two vocabulary sizes —
    the count-of-counts pipeline, boundary-class arithmetic, and the
    oversized-cutoff cap all value-hashed."""
    docs = load(spark, sf_dir, "documents")
    return coverage_curve(count_of_counts(docs))
