"""Sorted-neighborhood candidate generation — the third blocking
family beside MinHash-LSH bands (ml/dedup.py) and SimHash chunks.

The sorted-neighborhood method (Hernández & Stolfo, SIGMOD 1995) is
the classic record-linkage recipe: derive a sorting KEY per record,
sort, slide a window of w records, and emit every pair that co-occurs
in a window; run MULTI-PASS with independent keys to recover pairs a
single sort order splits.  It finds near-duplicates whose edits fall
OUTSIDE the key prefix — a regime where shingle-based methods need
many bands — at the cost of one sort per pass.

Spark-first formulation (blocked SNM, the standard distributed
variant): a global total order would serialize 10^12 rows through one
ordered sequence, so records are PARTITIONED by a key prefix (the
block) and the window slides within blocks only.  Pairs spanning a
block boundary are lost by design; the second pass with an
independent key (reversed normalization) is the published mitigation.
Each pass is: one slim (id, key) projection, one hash-partition by
block, an in-block sort, and a linear `lead()` sweep — no all-pairs
anywhere, and the payload never shuffles (keys are 40 chars).

Candidate verification here is Levenshtein over the keys (both
engines ship the same classic DP distance), with the pair emitted
either way so recall/precision of the gate is itself observable.

Reference analogue: readur's duplicate detection is exact-hash only
(file_service dedup policies, SURVEY §2 A6/B17); SNM is one of the
near-dup generalizations the LLM-data tier adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

KEY_LEN = 40   # normalized-prefix sorting key
BLOCK_LEN = 4  # hash-partition block = first chars of the key
WINDOW = 3     # each record pairs with the next w-1 in its block
LEV_MAX = 5    # verification gate on key edit distance


def _norm_key(text_col: str) -> F.Column:
    """lower → strip non-alnum → first KEY_LEN chars."""
    return F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""),
        1,
        KEY_LEN,
    )


def snm_candidate_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a_id, b_id, pass, block, lev, verified) candidate pairs from
    two blocked sorted-neighborhood passes: 'fwd' sorts on the
    normalized prefix, 'rev' on the reversed-text prefix (independent
    order, recovers head-edited pairs). a_id < b_id within a pass is
    NOT guaranteed — order follows the sort — but (pass, pair) rows
    are deterministic."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", "")
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.substring(norm, 1, KEY_LEN).alias("key_fwd"),
        F.substring(F.reverse(norm), 1, KEY_LEN).alias("key_rev"),
    )

    def one_pass(key: str, name: str) -> DataFrame:
        p = keyed.select(
            "id",
            F.col(key).alias("key"),
            F.substring(F.col(key), 1, BLOCK_LEN).alias("block"),
        )
        w = Window.partitionBy("block").orderBy("key", "id")
        offs = list(range(1, WINDOW))
        nxt = p.select(
            "id",
            "key",
            "block",
            F.array(
                *[
                    F.struct(
                        F.lead("id", o).over(w).alias("b_id"),
                        F.lead("key", o).over(w).alias("b_key"),
                    )
                    for o in offs
                ]
            ).alias("_n"),
        )
        pairs = nxt.select(
            F.col("id").alias("a_id"),
            F.col("key").alias("a_key"),
            "block",
            F.explode("_n").alias("n"),
        ).filter(F.col("n.b_id").isNotNull())
        return pairs.select(
            "a_id",
            F.col("n.b_id").alias("b_id"),
            F.lit(name).alias("pass"),
            "block",
            F.levenshtein("a_key", F.col("n.b_key")).alias("lev"),
        )

    out = one_pass("key_fwd", "fwd").unionByName(one_pass("key_rev", "rev"))
    return out.withColumn("verified", F.col("lev") <= LEV_MAX)


_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id AS id,
         substring(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
                   1, {KEY_LEN}) AS key_fwd,
         substring(reverse(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')),
                   1, {KEY_LEN}) AS key_rev
  FROM documents
), fwd AS (
  SELECT id, key_fwd AS key, substring(key_fwd, 1, {BLOCK_LEN}) AS block
  FROM keyed
), rev AS (
  SELECT id, key_rev AS key, substring(key_rev, 1, {BLOCK_LEN}) AS block
  FROM keyed
), pf AS (
  SELECT id AS a_id, key AS a_key, block,
         lead(id, 1) OVER w AS b1, lead(key, 1) OVER w AS k1,
         lead(id, 2) OVER w AS b2, lead(key, 2) OVER w AS k2
  FROM fwd WINDOW w AS (PARTITION BY block ORDER BY key, id)
), pr AS (
  SELECT id AS a_id, key AS a_key, block,
         lead(id, 1) OVER w AS b1, lead(key, 1) OVER w AS k1,
         lead(id, 2) OVER w AS b2, lead(key, 2) OVER w AS k2
  FROM rev WINDOW w AS (PARTITION BY block ORDER BY key, id)
), expanded AS (
  SELECT a_id, b1 AS b_id, 'fwd' AS pass, block,
         levenshtein(a_key, k1) AS lev FROM pf WHERE b1 IS NOT NULL
  UNION ALL
  SELECT a_id, b2, 'fwd', block, levenshtein(a_key, k2)
  FROM pf WHERE b2 IS NOT NULL
  UNION ALL
  SELECT a_id, b1, 'rev', block, levenshtein(a_key, k1)
  FROM pr WHERE b1 IS NOT NULL
  UNION ALL
  SELECT a_id, b2, 'rev', block, levenshtein(a_key, k2)
  FROM pr WHERE b2 IS NOT NULL
)
SELECT a_id, b_id, pass, block, lev, lev <= {LEV_MAX} AS verified
FROM expanded
"""


@register("snm_candidate_pairs", oracle=_ORACLE)
def snm_candidate_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass blocked sorted-neighborhood candidate pairs over the
    documents table, value-hashed: DuckDB replays key normalization,
    both sort orders, the lead() window sweep, and the Levenshtein
    verification gate."""
    return snm_candidate_pairs(load(spark, sf_dir, "documents"))
