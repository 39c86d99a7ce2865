"""Text normalization: Unicode NFC + whitespace/control cleanup.

Every public curation recipe normalizes text before hashing or
deduplicating — otherwise 'é' (U+00E9) and 'e'+U+0301 are different
bytes, different md5s, different dedup groups, and different tokens.

Two primitives with deliberately different execution tiers:

  - `clean_whitespace`: control-char strip + whitespace squash as
    pure Catalyst regexp_replace — codegen, fuses into the scan.
  - `nfc_normalize_col`: Unicode NFC via an Arrow-batched pandas UDF.
    This is the one curation primitive that genuinely NEEDS the
    Python boundary — Catalyst has no Unicode normalizer — and it
    follows the repo's UDF rules: Series-in/Series-out (one Arrow
    batch per call, no per-row pickling), a cheap all-ASCII fast path
    (ASCII is NFC-invariant, and most web text is mostly ASCII), and
    a slim projection contract (callers pass only the text column
    through the boundary).

The DuckDB oracle uses its native nfc_normalize over the identical
regexp_replace chain, so the UDF's output is value-hash-checked
byte-for-byte — the same oracle discipline as the JVM-side operators.

Reference analogue: readur normalizes extracted text before hashing
(src/ingestion/file_ingestion.rs hash-then-store path); generalized
here to the full NFC + whitespace contract.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# control chars except \t \n (kept: they carry document structure)
_CTRL_RE = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"
# runs of spaces/tabs collapse to one space; newlines preserved
_WS_RE = "[ \\t]+"


def clean_whitespace(text: Column) -> Column:
    """Strip control chars, squash space/tab runs, trim each line's
    trailing blanks. Pure Catalyst — no Python."""
    t = F.regexp_replace(text, _CTRL_RE, "")
    t = F.regexp_replace(t, _WS_RE, " ")
    return F.regexp_replace(t, " \\n", "\n")


@pandas_udf(StringType())
def nfc_normalize_col(s: pd.Series) -> pd.Series:
    """Unicode NFC, Arrow-batched. ASCII batches short-circuit."""
    import unicodedata

    def norm(x):
        if x is None:
            return None
        if x.isascii():  # NFC is the identity on ASCII
            return x
        return unicodedata.normalize("NFC", x)

    return s.map(norm)


def normalize_text(
    df: DataFrame, *, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """NFC + whitespace cleanup; adds `out_col` and `changed`."""
    cleaned = clean_whitespace(nfc_normalize_col(F.col(text_col)))
    return df.withColumn(out_col, cleaned).withColumn(
        "changed", F.col(out_col) != F.col(text_col)
    )


@register(
    "normalize_text_nfc",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             nfc_normalize(text),
             '{_CTRL_RE}', '', 'g'),
             '{_WS_RE}', ' ', 'g'),
             ' \\n', chr(10), 'g') AS norm_text,
           regexp_replace(regexp_replace(regexp_replace(
             nfc_normalize(text),
             '{_CTRL_RE}', '', 'g'),
             '{_WS_RE}', ' ', 'g'),
             ' \\n', chr(10), 'g') <> text AS changed
    FROM documents
    """,
)
def normalize_text_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC + whitespace normalization over documents — the pandas-UDF
    output value-hashed byte-for-byte against DuckDB's native
    nfc_normalize + the identical regexp chain."""
    docs = load(spark, sf_dir, "documents")
    return normalize_text(docs).select("doc_id", "norm_text", "changed")
