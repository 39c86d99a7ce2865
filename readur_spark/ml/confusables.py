"""Unicode confusable (homoglyph) skeletons: obfuscation-aware QC.

Spam and policy-evading web text hides blocklisted terms behind
lookalike code points — Cyrillic `саsіnо`, fullwidth `ｖｉａｇｒａ`,
zero-width joiners inside `lot​tery`. Unicode TR #39 ("Unicode
Security Mechanisms") defines the *skeleton* transform that folds
confusables to a canonical form so lookalikes compare equal; this
module implements a curated single-codepoint subset of that mapping
(the high-traffic Cyrillic/Greek/fullwidth letters plus the invisible
characters) as pure-Catalyst `translate` projections — the same
engine-exact char-for-char semantics in Spark and DuckDB. The
reference engine normalizes filenames/queries only for search
(src/db/documents.rs ILIKE paths); obfuscation folding is the
curation-tier extension of that normalization surface, composing with
`ml/blocklist.py` (which matches EXACT tokens and is blind to
homoglyphs by design).

Components:
  - `skeleton` — lower -> strip invisibles -> fold confusables; one
    codegen projection, no regex, no Python;
  - `confusable_stats` — per-doc invisible/confusable char counts and
    an `is_obfuscated` flag (skeleton differs from the lowered raw);
  - `skeleton_blocklist_evasion` — banned terms that match the
    SKELETON token stream but not the raw one: the evasion set proper
    (a raw `casino` is the plain blocklist's job, not this one's).
    Two slim equi-joins on the broadcast term table + one anti-join —
    never a contains-scan.

Scale: folding is a projection over text already in hand; the evasion
check explodes tokens once and joins a tiny broadcast term list; at
100 TB nothing here adds a corpus pass. Correctness: constructed docs
inject each evasion style by doc_id rule and the DuckDB oracles
restate counts and hits straight from the rule (no translate replay
needed — the rule KNOWS 'саsіnо' carries 4 confusables); fold-identity
and composition edges pinned in tests/test_confusables.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.ml.quality_lm import tokenize_alpha
from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# curated TR39 subset: single code points whose lowercase glyph is
# (near-)identical to an ASCII letter. Cyrillic + Greek lookalikes.
_CYR = {
    "а": "a", "е": "e", "о": "o", "р": "p",
    "с": "c", "у": "y", "х": "x", "к": "k",
    "в": "b", "н": "h", "м": "m", "т": "t",
    "і": "i", "ѕ": "s", "ј": "j", "ԁ": "d",
}
_GREEK = {
    "α": "a", "ο": "o", "ν": "v", "ε": "e",
    "ι": "i", "κ": "k", "ρ": "p", "τ": "t",
    "υ": "u", "χ": "x",
}
# fullwidth a-z (U+FF41..FF5A)
_FULLWIDTH = {chr(0xFF41 + i): chr(ord("a") + i) for i in range(26)}

_MAP = {**_CYR, **_GREEK, **_FULLWIDTH}
CONFUSABLE_FROM = "".join(_MAP)
CONFUSABLE_TO = "".join(_MAP.values())

# deleted outright: zero-width space/joiners, BOM, soft hyphen
INVISIBLE_CHARS = "​‌‍﻿­"


def strip_invisible(text: Column) -> Column:
    """Remove zero-width/invisible code points (translate-delete)."""
    return F.translate(text, INVISIBLE_CHARS, "")


def skeleton(text: Column) -> Column:
    """TR39-style skeleton (curated subset): lowercase, invisibles
    deleted, confusables folded to their ASCII targets."""
    return F.translate(
        strip_invisible(F.lower(text)), CONFUSABLE_FROM, CONFUSABLE_TO
    )


def confusable_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_invisible, n_confusable, is_obfuscated): char counts by
    translate-delete length difference; the flag is true when folding
    changed anything (an obfuscation or script-mixing signal for the
    QC tier). Staged projections; each translate runs once."""
    lowered = F.lower(F.col(text_col))
    return (
        df.withColumn("_lo", lowered)
        .withColumn("_vis", strip_invisible(F.col("_lo")))
        .withColumn(
            "n_invisible",
            (F.length("_lo") - F.length("_vis")).cast("long"),
        )
        .withColumn(
            "n_confusable",
            (
                F.length("_vis")
                - F.length(F.translate(F.col("_vis"), CONFUSABLE_FROM, ""))
            ).cast("long"),
        )
        .withColumn(
            "is_obfuscated",
            (F.col("n_invisible") > 0) | (F.col("n_confusable") > 0),
        )
        .select(
            id_col, "n_invisible", "n_confusable", "is_obfuscated"
        )
    )


def skeleton_blocklist_evasion(
    docs: DataFrame,
    terms: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, term) pairs where a banned term appears in the SKELETON
    token stream but not in the raw lowered one — i.e. the match
    exists only because of homoglyph/invisible obfuscation. Plain
    occurrences are ml/blocklist.py's catch; this returns the evasion
    set a reviewer actually wants to see."""
    sk_hits = (
        docs.select(
            F.col(id_col),
            F.explode(tokenize_alpha(skeleton(F.col(text_col)))).alias(
                "term"
            ),
        )
        .join(F.broadcast(terms), "term")
        .distinct()
    )
    raw_hits = (
        docs.select(
            F.col(id_col),
            F.explode(tokenize_alpha(F.col(text_col))).alias("term"),
        )
        .join(F.broadcast(terms), "term")
        .distinct()
    )
    return sk_hits.join(raw_hits, [id_col, "term"], "left_anti")


# ---------------------------------------------------------------------------
# Constructed corpus
# ---------------------------------------------------------------------------

_BANNED = ["casino", "viagra", "lottery"]


def _constructed_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id % 4: 0 -> Cyrillic-obfuscated casino (3 confusables);
    1 -> PLAIN casino (raw hit, not evasion); 2 -> fullwidth viagra
    (6 confusables); 3 -> clean. Independently, doc_id % 5 == 0 adds
    a zero-width-split lottery (1 invisible). Base text is pure
    ASCII."""
    d = F.col("doc_id").cast("string")
    inj4 = (
        F.when(F.col("doc_id") % 4 == 0, F.lit(" cаsіnо"))
        .when(F.col("doc_id") % 4 == 1, F.lit(" casino"))
        .when(
            F.col("doc_id") % 4 == 2,
            F.lit(
                " ｖｉａｇｒａ"
            ),
        )
        .otherwise(F.lit(""))
    )
    inj5 = F.when(
        F.col("doc_id") % 5 == 0, F.lit(" lot​tery")
    ).otherwise(F.lit(""))
    text = F.concat(
        F.lit("the page "), d, F.lit(" reads fine"), inj4, inj5
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", text.alias("text")
    )


@register(
    "qc_confusable_stats",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_invisible,
           CAST(CASE doc_id % 4 WHEN 0 THEN 3 WHEN 2 THEN 6
                ELSE 0 END AS BIGINT) AS n_confusable,
           (doc_id % 5 = 0 OR doc_id % 4 IN (0, 2)) AS is_obfuscated
    FROM documents
    """,
)
def qc_confusable_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invisible/confusable char census over the constructed corpus.
    The rule knows the counts: 'cаsіnо' carries 3
    confusable code points (а і о), fullwidth viagra 6,
    the split lottery 1 invisible."""
    return confusable_stats(_constructed_texts(spark, sf_dir))


@register(
    "blocklist_skeleton_evasion",
    oracle="""
    SELECT doc_id, 'casino' AS term FROM documents WHERE doc_id % 4 = 0
    UNION ALL
    SELECT doc_id, 'viagra' AS term FROM documents WHERE doc_id % 4 = 2
    UNION ALL
    SELECT doc_id, 'lottery' AS term FROM documents WHERE doc_id % 5 = 0
    """,
)
def blocklist_skeleton_evasion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Evasion hits only: the plain 'casino' docs (%4 == 1) must NOT
    appear (raw blocklist's catch), the three obfuscation styles
    must."""
    docs = _constructed_texts(spark, sf_dir)
    terms = spark.createDataFrame([(t,) for t in _BANNED], "term string")
    return skeleton_blocklist_evasion(docs, terms)
