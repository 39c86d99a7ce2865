"""Banned-term blocklist gate (C4's "bad words" document filter).

C4 (Raffel et al.) drops any page containing a term from a blocklist
(their instance: the LDNOOBW list, ~400 entries, unigrams AND
multi-word phrases, matched case-insensitively on word boundaries).
The repo's other gates keep their word sets as small array literals
(ml/webfilters.py stopwords — a language model, bounded by design); a
real blocklist is hundreds-to-thousands of entries and policy-owned,
so the scale path here is different: the list stays a DATAFRAME and
matching is a broadcast hash join on the exploded token stream —
list updates never recompile a plan literal, and the join survives a
list 1000x this size unchanged (the same literal-vs-join dispatch
argument as ml/linefilters.py's frequent-line set).

Matching semantics: text is lowercased and whitespace-tokenized (the
corpus-wide convention, ml/webfilters.py:83-85); unigram entries match
single tokens, two-word phrase entries match adjacent token BIGRAMS
(zip_with over the token array — no window, no self-join). Word
boundaries are exact token equality, so "class" never matches a
banned "ass" (C4's word-level semantics, not substring).

The registered list is a neutral 3-term instance over the synthetic
vocabulary (the gate is policy-parameterized; the term list is data,
not code — same stance as the stopword gate's ENGLISH_WORDS).

Scale design (10^12 docs): the exploded stream is SLIM (doc_id +
short token), the blocklist side broadcasts, the per-doc hit count is
one map-side-combinable aggregate, and docs join the hit frame back
on doc_id — the payload text never crosses a shuffle.

Reference tie-in: the reference's allowed-file-types gate
(src/services/file_service.rs ignore/allow paths) is the file-level
membership filter; this is its content-level corpus form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# registered operating point: neutral tokens over the synthetic vocab,
# chosen so both gate branches carry real mass at sf0.01 (~15% of docs
# hit at least one entry).
BANNED_TERMS = ("dup", "fast merge", "slow scan")


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def _bigrams(toks: Column) -> Column:
    """Adjacent-pair phrases from a token array: zip the array with
    its own tail. Spark's zip_with PADS the shorter side with nulls
    (it does not truncate), so the zipped result is sliced back to
    n-1 entries — otherwise the last token leaks as a phantom
    "bigram" via concat_ws's null-skipping."""
    n = F.size(toks)
    tail = F.slice(toks, 2, F.greatest(n - 1, F.lit(1)))
    zipped = F.zip_with(toks, tail, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(n > 1, F.slice(zipped, 1, n - 1)).otherwise(
        F.array().cast("array<string>")
    )


def banned_term_hits(
    df: DataFrame,
    terms: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_banned_hits) for every input row (0 when clean).
    `terms` is a one-column (term) frame of lowercase unigrams and
    two-word phrases; occurrences count multiset-style (every hit)."""
    toks = _tokens(F.col(text_col))
    uni = df.select(id_col, F.explode(toks).alias("term"))
    bi = df.select(id_col, F.explode(_bigrams(toks)).alias("term"))
    hits = (
        uni.unionByName(bi)
        .join(F.broadcast(terms), "term")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_banned_hits"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .withColumn(
            "n_banned_hits",
            F.coalesce(F.col("n_banned_hits"), F.lit(0)),
        )
    )


def blocklist_gate(
    df: DataFrame,
    terms: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds n_banned_hits and the C4 keep flag (drop on ANY hit)."""
    counted = banned_term_hits(
        df, terms, text_col=text_col, id_col=id_col
    )
    return counted.withColumn(
        "keep", (F.col("n_banned_hits") == 0).cast("int")
    )


# ---- driver-contract query ------------------------------------------------

_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in BANNED_TERMS) + ")"


@register(
    "qc_blocklist_gate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    u AS (
      SELECT doc_id, unnest(toks) AS term FROM t
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS term
      FROM t
    ),
    h AS (
      SELECT doc_id, count(*) AS n FROM u
      WHERE term IN {_TERMS_SQL} GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(h.n, 0) AS n_banned_hits,
           CAST(coalesce(h.n, 0) = 0 AS INT) AS keep
    FROM documents d LEFT JOIN h USING (doc_id)
    """,
)
def qc_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 banned-term gate (unigrams + adjacent-bigram phrases,
    broadcast-join matching) — per-doc hit counts and the keep flag
    value-hashed against the DuckDB replay."""
    docs = load(spark, sf_dir, "documents")
    terms = docs.sparkSession.createDataFrame(
        [(t,) for t in BANNED_TERMS], "term string"
    )
    out = blocklist_gate(docs, terms)
    return out.select(
        "doc_id",
        F.col("n_banned_hits").cast("long").alias("n_banned_hits"),
        "keep",
    )
