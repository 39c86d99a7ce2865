"""Secret / credential detection — the training-data scrubbing gate.

Web and code corpora leak API keys, tokens, and password material;
every production LLM-data pipeline runs a secrets scan before
training (the public recipe is Yelp's detect-secrets / truffleHog
family).  This module re-implements the ENTROPY tier of that recipe
Spark-first:

  1. Candidate extraction: maximal runs over the base64ish charset
     (`[A-Za-z0-9+/=_-]{20,}`) and word-bounded hex runs
     (`[0-9a-fA-F]{32,}`) — the two detect-secrets
     HighEntropyString scanners.
  2. Per-candidate Shannon CHARACTER entropy, computed without any
     Python and without exploding characters: for each symbol of the
     66-char union alphabet, `count = length(cand) -
     length(replace(cand, sym, ''))` (the replace-trick), then
     `H = log2(L) - Σ c·log2(c) / L` over the non-zero counts via
     array HOFs.  A natural-language word scores ~2.5-3.5 bits; real
     key material scores near the charset maximum (≈6 for base64,
     ≈4 for hex).
  3. Flag thresholds: detect-secrets' published defaults — 4.5 bits
     for base64 candidates, 3.0 bits for hex candidates.
  4. A per-document KEYWORD context bit (`api_key|secret|token|…`)
     — the cheap precision booster the keyword scanner contributes.

Reference analogue: readur's OCR-quality heuristics classify text by
character-composition statistics (src/ocr/enhanced.rs:923-976); this
is the same statistical machinery pointed at credential hygiene.

Scale design: candidates are extracted in ONE projection over the
payload (regexp_extract_all, codegen), the per-candidate frame is
slim (doc_id, kind, cand), entropy is a pure projection (66 replaces
per candidate — constant work, no shuffle), and the per-doc rollup
is a single map-side-combinable aggregation.  The payload itself
never shuffles.  At 10^12 docs the candidate frame is ~the number of
long alnum runs — orders of magnitude smaller than the token frame
the entropy/richness tiers already shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# detect-secrets' two high-entropy scanners (charset + minimum length)
B64_RE = r"[A-Za-z0-9+/=_-]{20,}"
HEX_RE = r"\\b[0-9a-fA-F]{32,}\\b"
# detect-secrets' published default limits (bits of char entropy)
B64_LIMIT = 4.5
HEX_LIMIT = 3.0
# keyword scanner context (per-document bit)
KEYWORD_RE = r"(?i)(api[_-]?key|secret|token|passwd|password|credential|private[_-]?key)"

# union alphabet: every char either charset can emit (66 symbols)
_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    "0123456789+/=_-"
)
_SYM_CSV = ",".join(_ALPHABET)


def char_entropy_bits(col: str) -> F.Column:
    """Shannon character entropy (bits) of a string column whose chars
    all come from `_ALPHABET`, as a pure Catalyst projection: the
    replace-trick per symbol, then the log2 decomposition
    H = log2(L) - Σ c·log2(c) / L over non-zero counts."""
    counts = (
        f"transform(split('{_SYM_CSV}', ','), "
        f"s -> length({col}) - length(replace({col}, s, '')))"
    )
    nz = f"filter({counts}, c -> c > 0)"
    ssum = f"aggregate({nz}, cast(0 as double), (a, c) -> a + c * log2(c))"
    return F.expr(f"log2(length({col})) - {ssum} / length({col})")


def secret_candidates(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, kind, cand, entropy_bits, flagged) — one row per extracted
    candidate.  `kind` is 'b64' or 'hex'; a hex digest matches both
    scanners (hex charset ⊂ base64 charset), mirroring detect-secrets
    running both plugins independently."""
    base = df.select(F.col(id_col), F.col(text_col).alias("_t"))
    b64 = base.select(
        id_col,
        F.lit("b64").alias("kind"),
        F.explode(F.expr(f"regexp_extract_all(_t, '{B64_RE}', 0)")).alias(
            "cand"
        ),
    )
    hx = base.select(
        id_col,
        F.lit("hex").alias("kind"),
        F.explode(F.expr(f"regexp_extract_all(_t, '{HEX_RE}', 0)")).alias(
            "cand"
        ),
    )
    cands = b64.unionByName(hx).withColumn(
        "entropy_bits", F.round(char_entropy_bits("cand"), 3)
    )
    return cands.withColumn(
        "flagged",
        F.when(F.col("kind") == "b64", F.col("entropy_bits") >= B64_LIMIT)
        .otherwise(F.col("entropy_bits") >= HEX_LIMIT),
    )


def secrets_report(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document secrets rollup: candidate counts per scanner,
    flagged count, max candidate entropy, and the keyword-context
    bit.  Only documents with ≥1 candidate appear (slim output)."""
    cands = secret_candidates(df, text_col=text_col, id_col=id_col)
    per_doc = cands.groupBy(id_col).agg(
        F.sum(F.when(F.col("kind") == "b64", 1).otherwise(0))
        .cast("long")
        .alias("n_b64"),
        F.sum(F.when(F.col("kind") == "hex", 1).otherwise(0))
        .cast("long")
        .alias("n_hex"),
        F.sum(F.when(F.col("flagged"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.max("entropy_bits").alias("max_entropy_bits"),
    )
    kw = df.select(
        F.col(id_col),
        (F.expr(f"regexp_count({text_col}, '{KEYWORD_RE}')") > 0).alias(
            "has_keyword"
        ),
    )
    return per_doc.join(kw, id_col).select(
        id_col, "n_b64", "n_hex", "n_flagged", "max_entropy_bits",
        "has_keyword",
    )


# ---- constructed corpus (SQL-twinnable ground truth) -----------------------
#
# The synthetic documents table contains no 20+-char alnum runs, so the
# scan over raw text is vacuous.  Following the repo's constructed-
# corpus pattern (mojibake/image-meta/outlink-edges), secrets are
# INJECTED deterministically from content-addressed md5 material both
# engines can replay byte-for-byte:
#   doc_id % 3 == 0 → a 32-char hex digest        (hex scanner target)
#   doc_id % 5 == 0 → "api_key=" + one base64 digest   (keyword + b64,
#                      24 chars — entropy straddles the 4.5 limit, so
#                      the flag column is exercised both ways)
#   doc_id % 7 == 0 → two concatenated base64 digests  (48 chars, well
#                      above the limit — the always-flagged tier)


def constructed_secret_pages(df: DataFrame) -> DataFrame:
    """(doc_id, text) with deterministic md5/base64 secrets appended
    per the modulus rule above. Spark `base64(unhex(md5(x)))` and
    DuckDB `to_base64(unhex(md5(x)))` agree (16-byte input → 24 chars,
    no MIME line wrapping)."""
    t = F.col("text")
    hex_part = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" "), F.md5(F.col("doc_id").cast("string"))),
    ).otherwise(F.lit(""))
    b64_1 = F.base64(F.unhex(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("k")))))
    kw_part = F.when(
        F.col("doc_id") % 5 == 0, F.concat(F.lit(" api_key="), b64_1)
    ).otherwise(F.lit(""))
    b64_2 = F.base64(F.unhex(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("a")))))
    b64_3 = F.base64(F.unhex(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("b")))))
    strong_part = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.lit(" "), b64_2, b64_3)
    ).otherwise(F.lit(""))
    return df.select(
        "doc_id", F.concat(t, hex_part, kw_part, strong_part).alias("text")
    )


_CONSTRUCT_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' ' || md5(CAST(doc_id AS VARCHAR)) ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' api_key=' ||
                      to_base64(unhex(md5(CAST(doc_id AS VARCHAR) || 'k')))
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ' ||
                      to_base64(unhex(md5(CAST(doc_id AS VARCHAR) || 'a'))) ||
                      to_base64(unhex(md5(CAST(doc_id AS VARCHAR) || 'b')))
                 ELSE '' END
           AS text
  FROM documents
"""


_ORACLE = f"""
WITH docs AS (
{_CONSTRUCT_SQL}
), b AS (
  SELECT doc_id, 'b64' AS kind,
         unnest(regexp_extract_all(text, '[A-Za-z0-9+/=_-]{{20,}}', 0))
           AS cand
  FROM docs
), h AS (
  SELECT doc_id, 'hex' AS kind,
         unnest(regexp_extract_all(text, '\\b[0-9a-fA-F]{{32,}}\\b', 0))
           AS cand
  FROM docs
), cand AS (
  SELECT * FROM b UNION ALL SELECT * FROM h
), sym AS (
  SELECT unnest(string_split('{_SYM_CSV}', ',')) AS s
), cnt AS (
  SELECT doc_id, kind, cand,
         length(cand) - length(replace(cand, s, '')) AS c
  FROM cand CROSS JOIN sym
), ent AS (
  SELECT doc_id, kind, cand,
         round(log2(length(cand)) - sum(c * log2(c)) / length(cand), 3)
           AS entropy_bits
  FROM cnt WHERE c > 0
  GROUP BY doc_id, kind, cand
), flags AS (
  SELECT doc_id, kind, entropy_bits,
         CASE WHEN kind = 'b64' THEN entropy_bits >= {B64_LIMIT}
              ELSE entropy_bits >= {HEX_LIMIT} END AS flagged
  FROM ent
), per_doc AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN kind = 'b64' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_b64,
         CAST(sum(CASE WHEN kind = 'hex' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hex,
         CAST(sum(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
         max(entropy_bits) AS max_entropy_bits
  FROM flags GROUP BY doc_id
)
SELECT p.doc_id, p.n_b64, p.n_hex, p.n_flagged, p.max_entropy_bits,
       regexp_matches(d.text,
         '(?i)(api[_-]?key|secret|token|passwd|password|credential|private[_-]?key)')
         AS has_keyword
FROM per_doc p JOIN docs d ON p.doc_id = d.doc_id
"""


@register("secrets_entropy_constructed", oracle=_ORACLE)
def secrets_entropy_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """detect-secrets-style high-entropy credential scan over the
    constructed corpus, value-hashed: DuckDB replays the secret
    injection rule, candidate extraction, the replace-trick character
    counts, the entropy decomposition, both flag thresholds, and the
    keyword-context bit."""
    docs = constructed_secret_pages(load(spark, sf_dir, "documents"))
    return secrets_report(docs)
