"""Mojibake (encoding-damage) detection and repair.

Web crawls are full of UTF-8 text that was decoded as cp1252/Latin-1
somewhere upstream and re-encoded — 'é' becomes 'Ã©', '—' becomes
'â€”', sometimes twice. The standard published fix (the ftfy recipe,
Speer 2019) inverts the damage: re-encode the text as cp1252 and decode
the bytes as UTF-8, accepting the result only when it strictly reduces
mojibake-signature density; iterate for double-encoded text. The
reference engine's analogue is its OCR text-quality validation
(src/ocr/enhanced.rs quality heuristics — it detects corrupted
extractions); this repairs the dominant *encoding* corruption class
instead of rejecting the document.

Scale design:
  - the kernel is an Arrow-batched pandas UDF (one Python call per
    record batch); the signature pre-filter (`'Ã' / 'â€' / 'Â'`) is a
    vectorized C-level regex scan inside the batch, so clean documents
    — the overwhelming majority at crawl scale — never reach per-row
    Python repair (a JVM CASE WHEN could not provide this gate:
    Catalyst extracts Python UDFs out of conditionals and evaluates
    them unconditionally);
  - repair is a pure projection: no shuffle, fuses into the scan.

The registered query runs over a CONSTRUCTED corpus: accents and an
em dash are injected into the synthetic documents with SQL-expressible
replace chains, then garbled with the exact cp1252 byte renderings —
so the DuckDB oracle knows the ground-truth clean text and value-hashes
the repaired output end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# cp1252-mojibake signatures: 'Ã' (leading byte of 2-byte UTF-8 seen
# as cp1252), 'â€' (leading pair of 3-byte punctuation sequences),
# 'Â' (C2-prefixed Latin-1 supplement).
_SIGNS = ("Ã", "â€", "Â")
_MAX_PASSES = 3  # handles double-encoded text; third pass proves fixpoint


def _badness(s: str) -> int:
    return sum(s.count(sig) for sig in _SIGNS)


def repair_mojibake_str(s: str, max_passes: int = _MAX_PASSES) -> str:
    """Invert cp1252-as-UTF-8 damage on one string (ftfy recipe):
    encode cp1252 → decode UTF-8, accepted only when every byte maps
    and the signature count strictly drops. Idempotent on clean text."""
    for _ in range(max_passes):
        bad = _badness(s)
        if bad == 0:
            break
        try:
            t = s.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            break
        if _badness(t) >= bad:
            break
        s = t
    return s


_SIGN_RE = "Ã|â€|Â"


@F.pandas_udf(StringType())
def _repair_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # Vectorized pre-filter INSIDE the Arrow batch: pandas' C-level
    # regex scan selects the (rare at crawl scale) signature rows, and
    # only those enter per-row Python repair. Wrapping the UDF in a
    # JVM-side CASE WHEN would NOT achieve this — Catalyst extracts
    # Python UDFs out of conditionals into an unconditional
    # ArrowEvalPython node — so the gate lives where it actually runs.
    for s in batches:
        mask = s.str.contains(_SIGN_RE, regex=True, na=False)
        if mask.any():
            s = s.copy()
            s[mask] = s[mask].map(repair_mojibake_str)
        yield s


def repair_mojibake(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "repaired_text",
    flag_col: str = "was_mojibake",
) -> DataFrame:
    """Add `out_col` (repaired text) and `flag_col` (whether repair
    changed anything). One Arrow pass; clean rows are screened by the
    vectorized signature mask and never touch per-row Python."""
    return df.withColumn(out_col, _repair_udf(F.col(text_col))).withColumn(
        flag_col, F.col(out_col) != F.col(text_col)
    )


# ---- constructed corpus (SQL-twinnable ground truth) -----------------------

# injection: em dash + two accented vowels, applied in this order on
# both sides (the replace chains don't interact: no later pattern
# occurs inside an earlier replacement).
_INJECT = [(" the ", " — "), ("a", "ä"), ("o", "ö")]
# garbling: each injected char's UTF-8 bytes rendered as cp1252.
_GARBLE = [
    ("—", "â€”"),  # — : E2 80 94 -> 'â€”'
    ("ä", "Ã¤"),  # ä : C3 A4 -> 'Ã¤'
    ("ö", "Ã¶"),  # ö : C3 B6 -> 'Ã¶'
]


def constructed_mojibake_pages(df: DataFrame) -> DataFrame:
    """(doc_id, text) frame where text is the cp1252-garbled rendering
    of a deterministically accented version of each document."""
    col = F.col("text")
    for a, b in _INJECT + _GARBLE:
        col = F.replace(col, F.lit(a), F.lit(b))
    return df.select("doc_id", col.alias("text"))


def _construct_sql() -> tuple[str, str]:
    clean = "text"
    for a, b in _INJECT:
        clean = f"replace({clean}, '{a}', '{b}')"
    garbled = clean
    for a, b in _GARBLE:
        garbled = f"replace({garbled}, '{a}', '{b}')"
    return clean, garbled


_CLEAN_SQL, _GARBLED_SQL = _construct_sql()


@register(
    "mojibake_repair_constructed",
    oracle=f"""
    SELECT doc_id,
           {_CLEAN_SQL} AS repaired_text,
           ({_GARBLED_SQL} <> {_CLEAN_SQL}) AS was_mojibake
    FROM documents
    """,
)
def mojibake_repair_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ftfy-style mojibake repair over a constructed garbled corpus —
    the oracle knows the ground-truth clean text (the garbling rule is
    replayed in SQL), so the kernel's full inversion is value-hashed
    byte-for-byte, including the untouched-rows fast path."""
    docs = constructed_mojibake_pages(load(spark, sf_dir, "documents"))
    out = repair_mojibake(docs)
    return out.select("doc_id", "repaired_text", "was_mojibake")
