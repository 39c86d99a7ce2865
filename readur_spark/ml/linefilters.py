"""Line-level curation: C4 line gates + corpus-frequency line dedup.

Two public-recipe stages that operate on LINES inside each document
(distinct from the doc-level C4/Gopher gates in ml/webfilters.py):

  1. C4 line filters (Raffel et al., C4): keep only lines that end in
     terminal punctuation, have >= 5 words, and don't contain
     "javascript" or a curly brace — the cheap pass that strips nav
     bars, cookie banners, and code fragments from extracted pages.

  2. Duplicated-line removal (Gopher / RefinedWeb): lines that repeat
     verbatim across many documents are boilerplate; drop every line
     whose corpus document-frequency exceeds a threshold.

The reference engine's analogue is its extraction-quality text
cleanup (src/ocr/enhanced.rs:1487-1558 quality heuristics); these
generalize it to corpus-statistical line hygiene.

Scale design:
  - the C4 gate is a PURE PROJECTION: split -> array filter ->
    array_join, all higher-order Catalyst functions — zero shuffle,
    zero explode, zero Python (plan-pinned); at 10^12 docs the stage
    fuses into the scan;
  - line dedup needs cross-doc document frequency, computed on a SLIM
    (line-hash) explode — the line text is dropped before the only
    shuffle (16-byte md5 prefixes through the agg). The frequent set
    (boilerplate lines, naturally bounded: each entry repeats >= N
    times, so there are at most corpus_lines/N of them) comes back as
    a broadcast literal, and the removal pass is again a pure
    projection — the payload never crosses the wire. Same
    broadcast-the-small-side shape as ml/decontam.py's eval shingles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

MIN_LINE_WORDS = 5
TERMINAL_PUNCT_RE = '[.!?"]$'
LINE_DF_THRESHOLD = 5  # a line in >= this many docs is boilerplate
_HASH_PREFIX = 16  # md5 hex chars per line key (64 bits)


def _line_keep(
    ln: Column,
    *,
    min_words: int = MIN_LINE_WORDS,
    require_punct: bool = True,
) -> Column:
    """The C4 line gate as an expression over one line. `min_words`
    and `require_punct` parameterize the two tunable rules (C4's paper
    values are 5 and True); the javascript / curly-brace code gates
    are unconditional."""
    words = F.size(F.filter(F.split(F.trim(ln), r"\s+"), lambda w: w != F.lit("")))
    keep = (
        (words >= min_words)
        & ~F.lower(ln).contains("javascript")
        & ~ln.contains("{")
    )
    if require_punct:
        keep = keep & F.rtrim(ln).rlike(TERMINAL_PUNCT_RE)
    return keep


def c4_line_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
    min_words: int = MIN_LINE_WORDS,
    require_punct: bool = True,
) -> DataFrame:
    """Apply the C4 line gates inside each document; adds `out_col`
    plus n_lines / n_lines_kept counters. Pure projection."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda ln: _line_keep(
            ln, min_words=min_words, require_punct=require_punct
        ),
    )
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(out_col, F.array_join(kept, "\n"))
    )


def frequent_line_hashes(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_df: int = LINE_DF_THRESHOLD,
) -> list[str]:
    """md5-prefix hashes of lines whose corpus DOCUMENT frequency
    (distinct docs, so a line repeated inside one page doesn't count)
    reaches min_df. Slim explode: only the hash survives to the agg.

    Returns a driver-side list — bounded by corpus_lines/min_df and in
    practice by the count of true boilerplate strings; at 10^12 docs
    feed it a bloom filter / broadcast join instead of a literal."""
    h = F.substring(F.md5(F.encode(F.col("_line"), "UTF-8")), 1, _HASH_PREFIX)
    rows = (
        df.select(
            F.col("doc_id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
        )
        .filter(F.trim(F.col("_line")) != "")
        .select("doc_id", h.alias("h"))
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h")
        .collect()
    )
    return sorted(r["h"] for r in rows)


def remove_frequent_lines(
    df: DataFrame,
    frequent: list[str],
    *,
    text_col: str = "text",
    out_col: str = "clean_text",
) -> DataFrame:
    """Drop every line whose hash is in `frequent`; blank lines are
    preserved (they carry structure, not boilerplate). Pure
    projection against the broadcast literal set."""
    freq = F.lit(frequent).cast("array<string>")
    lines = F.split(F.col(text_col), "\n")

    def keep(ln: Column) -> Column:
        h = F.substring(F.md5(F.encode(ln, "UTF-8")), 1, _HASH_PREFIX)
        return (F.trim(ln) == "") | ~F.array_contains(freq, h)

    kept = F.filter(lines, keep)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_lines_kept", F.size(kept))
        .withColumn(out_col, F.array_join(kept, "\n"))
    )


def with_dup_line_stats(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signal: the fraction of
    non-blank lines that are duplicates of an earlier line in the SAME
    document (the paper drops docs above ~0.3). Pure projection —
    array_distinct over the split, no shuffle."""
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda x: F.trim(x) != F.lit("")
    )
    n = F.size(lines)
    d = F.size(F.array_distinct(lines))
    return (
        df.withColumn("n_lines_nonblank", n)
        .withColumn("n_lines_distinct", d)
        .withColumn(
            "dup_line_fraction",
            F.when(n > 0, (n - d) / n).otherwise(F.lit(0.0)),
        )
    )


# ---- driver-contract queries -------------------------------------------

def gate_sql(min_words: int = MIN_LINE_WORDS, require_punct: bool = True) -> str:
    """DuckDB twin of `_line_keep` at the same operating point (the
    oracle fragments must track the expression parameterization)."""
    punct = (
        "regexp_matches(rtrim(x), '[.!?\"]$') AND " if require_punct else ""
    )
    return (
        punct
        + "len(list_filter(regexp_split_to_array(trim(x), '\\s+'), "
        + f"w -> w <> '')) >= {min_words} "
        + "AND NOT contains(lower(x), 'javascript') "
        + "AND NOT contains(x, '{')"
    )


_GATE_SQL = gate_sql()


@register(
    "c4_line_filter_clean",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, chr(10))) AS n_lines,
           len(list_filter(string_split(text, chr(10)),
               x -> {_GATE_SQL})) AS n_lines_kept,
           coalesce(array_to_string(list_filter(string_split(text, chr(10)),
               x -> {_GATE_SQL}), chr(10)), '') AS clean_text
    FROM documents
    """,
)
def c4_line_filter_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line gates over documents — cleaned text value-hashed
    byte-for-byte against DuckDB's list_filter twin."""
    docs = load(spark, sf_dir, "documents")
    out = c4_line_filter(docs)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        "clean_text",
    )


@register(
    "line_dedup_clean",
    oracle=f"""
    WITH lines AS (
      SELECT doc_id, t.ln
      FROM documents, UNNEST(string_split(text, chr(10))) AS t(ln)
      WHERE trim(t.ln) <> ''
    ),
    freq AS (
      SELECT substr(md5(ln), 1, {_HASH_PREFIX}) AS h
      FROM lines
      GROUP BY substr(md5(ln), 1, {_HASH_PREFIX})
      HAVING count(DISTINCT doc_id) >= {LINE_DF_THRESHOLD}
    ),
    fl AS (SELECT coalesce(list(h), []) AS hs FROM freq)
    SELECT d.doc_id,
           len(string_split(d.text, chr(10))) AS n_lines,
           len(list_filter(string_split(d.text, chr(10)),
               x -> trim(x) = '' OR NOT list_contains(fl.hs,
                    substr(md5(x), 1, {_HASH_PREFIX})))) AS n_lines_kept,
           coalesce(array_to_string(list_filter(string_split(d.text, chr(10)),
               x -> trim(x) = '' OR NOT list_contains(fl.hs,
                    substr(md5(x), 1, {_HASH_PREFIX}))), chr(10)), '')
             AS clean_text
    FROM documents d, fl
    """,
)
def line_dedup_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency line dedup over documents — frequent-line set
    recomputed in DuckDB from the same md5 prefixes; cleaned text
    value-hashed byte-for-byte."""
    docs = load(spark, sf_dir, "documents")
    freq = frequent_line_hashes(docs)
    out = remove_frequent_lines(docs, freq)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
        "clean_text",
    )


@register(
    "qc_dup_line_fraction",
    oracle="""
    WITH l AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> trim(x) <> '') AS ls
      FROM documents
    )
    SELECT doc_id,
           len(ls) AS n_lines_nonblank,
           len(list_distinct(ls)) AS n_lines_distinct,
           CASE WHEN len(ls) > 0
                THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
                     / len(ls)
                ELSE 0.0 END AS dup_line_fraction
    FROM l
    """,
)
def qc_dup_line_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-line fraction (Gopher repetition
    rule) — exact IEEE division of small ints, value-hash-stable."""
    docs = load(spark, sf_dir, "documents")
    out = with_dup_line_stats(docs)
    return out.select(
        "doc_id",
        F.col("n_lines_nonblank").cast("long").alias("n_lines_nonblank"),
        F.col("n_lines_distinct").cast("long").alias("n_lines_distinct"),
        F.col("dup_line_fraction").cast("double").alias("dup_line_fraction"),
    )
