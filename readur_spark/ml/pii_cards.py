"""Payment-card PII detection with Luhn (mod-10) validation.

Extends ml/webfilters.py's regex PII tier (emails / IPv4 / phones) with
the class that regexes alone can't decide: 13–16-digit runs are card
numbers only if they pass the ISO/IEC 7812 Luhn checksum, and a curation
pipeline wants BOTH counts — candidates (for over-redaction policies)
and Luhn-valid hits (the actual leak signal). The reference engine's
analogue is its OCR text validation tier (src/ocr/enhanced.rs quality
heuristics); this is the PII-specific sibling every web-corpus release
checklist (C4, Dolma, RefinedWeb) includes.

Scale design:
  - candidate extraction is `regexp_extract_all` (one JVM pass);
  - the Luhn checksum is a pure Catalyst HOF chain —
    split→transform-with-index→aggregate — zero Python, zero shuffle;
    the whole operator fuses into the scan projection;
  - redaction policy: ALL card-shaped digit runs are scrubbed
    (over-redaction is the published-corpus default — a conditional
    per-match replace would need a custom kernel for no safety gain);
    the Luhn flag feeds metrics/blocking decisions, not the scrub.

The registered query seeds deterministic card-shaped tails (same
expression in the oracle), so candidates AND per-candidate Luhn
verdicts are value-hashed end-to-end; validity varies naturally with
doc_id (~1 in 10 seeded numbers passes), exercising both branches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# RE2/Java-compatible: plain digit runs; the 4-4-4-4 grouped form is
# normalized by stripping separators before the length gate.
CARD_RE = r"\b\d{13,16}\b"

_LUHN_EXPR = """
aggregate(
  transform(split(reverse({num}), ''),
    (d, i) -> CASE WHEN i % 2 = 1 THEN
                 IF(CAST(d AS INT) * 2 > 9,
                    CAST(d AS INT) * 2 - 9,
                    CAST(d AS INT) * 2)
               ELSE CAST(d AS INT) END),
  0, (acc, x) -> acc + x) % 10 = 0
"""


def luhn_valid(num_col: str) -> Column:
    """True iff the digit-string column passes the Luhn mod-10 check.
    Pure Catalyst HOFs (split → indexed transform → aggregate)."""
    return F.expr(_LUHN_EXPR.format(num=num_col))


def card_candidates(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, num, luhn_ok) — one row per card-shaped digit run."""
    return (
        df.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(CARD_RE), F.lit(0))
            ).alias("num"),
        )
        .withColumn("luhn_ok", luhn_valid("num"))
    )


def redact_cards(text: Column) -> Column:
    """Scrub every card-shaped digit run (policy: over-redact)."""
    return F.regexp_replace(text, CARD_RE, "<CARD>")


# DuckDB twin of the Luhn HOF chain (range-zip indexing, the repo's
# established ordinality idiom): i is the 1-based position in the
# REVERSED number, doubling even positions == Spark's 0-based odd.
_LUHN_SQL = """
(list_sum(list_transform(range(1, length(num) + 1),
   i -> CASE WHEN i % 2 = 0
        THEN CASE WHEN CAST(substr(reverse(num), i, 1) AS INT) * 2 > 9
                  THEN CAST(substr(reverse(num), i, 1) AS INT) * 2 - 9
                  ELSE CAST(substr(reverse(num), i, 1) AS INT) * 2 END
        ELSE CAST(substr(reverse(num), i, 1) AS INT) END)) % 10 = 0)
"""

# seeded query: deterministic 16-digit tail per doc ('4' + 8 digits of
# doc_id + 6 of a prime multiple + final digit) — whether the last
# digit is a correct Luhn check digit varies naturally with doc_id.
@register(
    "pii_luhn_cards",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' card 4' || lpad(CAST(doc_id % 100000000 AS VARCHAR), 8, '0')
                  || lpad(CAST((doc_id * 31) % 1000000 AS VARCHAR), 6, '0')
                  || CAST(doc_id % 10 AS VARCHAR) AS t
      FROM documents
    ),
    cand AS (
      SELECT doc_id, unnest(regexp_extract_all(t, '{CARD_RE}')) AS num
      FROM seeded
    )
    SELECT doc_id, num, {_LUHN_SQL} AS luhn_ok
    FROM cand
    """,
)
def pii_luhn_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Card-number detection + Luhn validation over a seeded corpus —
    candidate extraction and every per-candidate mod-10 verdict are
    value-hashed against the DuckDB twin of the same HOF checksum."""
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" card 4"),
            F.lpad((F.col("doc_id") % 100000000).cast("string"), 8, "0"),
            F.lpad(((F.col("doc_id") * 31) % 1000000).cast("string"), 6, "0"),
            (F.col("doc_id") % 10).cast("string"),
        ).alias("text"),
    )
    return card_candidates(seeded)
