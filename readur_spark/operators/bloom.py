"""Bloom-filter seen-set — the crawl-frontier membership primitive.

A continuous crawl must answer "have we already fetched this url?"
against a 10^12-row history WITHOUT joining candidates to the history
table. The classic answer (Bloom, CACM 1970) is a fixed-size bitmap of
k salted hash positions per key: bounded memory regardless of corpus
size, no false negatives, tunable false-positive rate.

Engine shape:
  - the "bitmap" is materialized as its OCCUPIED-POSITION SET — a
    distinct (salt, bit) frame bounded by k·16^hex_chars rows (k=4,
    hex_chars=4 → ≤262,144 rows ≈ a few MB) however large the seen
    corpus is. Building it is one slim explode + distinct aggregate
    over md5 prefixes (the repo's standard engine-portable hash).
  - probing broadcast-joins the candidate's k positions against that
    set: a candidate missing ANY position is guaranteed-new (the Bloom
    no-false-negative contract); all-k-present means "seen, or a false
    positive" — exactly the semantics a frontier needs (re-fetching a
    false positive is safe; missing a new url is not... strictly the
    reverse: a false positive SKIPS a genuinely-new url, so the fpp is
    sized small and a periodic exact reconciliation pass owns the tail).
  - on a cluster the (salt, bit) set is the broadcast variable; the
    history table is never touched at probe time. Incremental updates
    are a union + distinct — the set is mergeable across shards and
    across days (same property the HLL sketch in ml/textqc.py rides).

The DuckDB oracle replays the identical salted md5 positions, so build
and probe are value-hash-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_SALTS = ["s0", "s1", "s2", "s3"]  # k = 4 hash functions
BLOOM_HEX_CHARS = 4  # 16 bits/position → m = 65,536 slots


def _position(salt_col, key_col, hex_chars: int):
    """Bloom position = first hex_chars of md5(salt ':' key) — the
    repo's engine-portable hash idiom (same bytes in Spark and
    DuckDB)."""
    return F.substring(
        F.md5(F.encode(F.concat(salt_col, F.lit(":"), key_col), "UTF-8")),
        1, hex_chars,
    )


def bloom_bits(
    seen: DataFrame,
    key_col: str,
    salts: list[str] | None = None,
    hex_chars: int = BLOOM_HEX_CHARS,
) -> DataFrame:
    """(salt, bit) occupied-position set of the seen keys. Slim explode
    (k rows per key, two short strings) + distinct — map-side
    combinable, output bounded by k·16^hex_chars rows."""
    salts = salts or BLOOM_SALTS
    salted = seen.select(
        F.explode(F.array(*[F.lit(s) for s in salts])).alias("salt"),
        F.col(key_col).alias("_k"),
    )
    return salted.select(
        "salt", _position(F.col("salt"), F.col("_k"), hex_chars).alias("bit")
    ).distinct()


def bloom_probe(
    candidates: DataFrame,
    bits: DataFrame,
    key_col: str,
    salts: list[str] | None = None,
    hex_chars: int = BLOOM_HEX_CHARS,
) -> DataFrame:
    """(key, n_hits, is_new): is_new = at least one of the k positions
    is unoccupied (guaranteed-new); n_hits exposes the partial-match
    count so tests and oracles can pin the internals. The bits frame
    broadcast-joins; candidates shuffle only as slim (key, salt, bit)
    rows for the final count."""
    salts = salts or BLOOM_SALTS
    k = len(salts)
    cb = candidates.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(*[F.lit(s) for s in salts])).alias("salt"),
    ).withColumn("bit", _position(F.col("salt"), F.col("key"), hex_chars))
    marked = cb.join(
        F.broadcast(bits.withColumn("_hit", F.lit(1))), ["salt", "bit"], "left"
    )
    return (
        marked.groupBy("key")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"))
        .select(
            F.col("key"),
            F.col("n_hits").cast("long").alias("n_hits"),
            (F.col("n_hits") < k).alias("is_new"),
        )
    )


# ---- registered query -------------------------------------------------------

from readur_spark.queries.registry import register  # noqa: E402
from readur_spark.queries.tables import SYNTH_URL_SQL, load, synthetic_url  # noqa: E402

_SALT_VALUES = ", ".join("('%s')" % s for s in BLOOM_SALTS)


@register(
    "crawl_frontier_bloom",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {SYNTH_URL_SQL} AS url FROM documents
    ), salts(salt) AS (VALUES {_SALT_VALUES}),
    bits AS (
      SELECT DISTINCT salts.salt,
             substr(md5(salts.salt || ':' || b.url), 1, {BLOOM_HEX_CHARS}) AS bit
      FROM base b CROSS JOIN salts WHERE b.doc_id % 3 <> 0
    ), cb AS (
      SELECT c.url AS key, salts.salt,
             substr(md5(salts.salt || ':' || c.url), 1, {BLOOM_HEX_CHARS}) AS bit
      FROM base c CROSS JOIN salts WHERE c.doc_id % 2 = 0
    ), hits AS (
      SELECT cb.key, CAST(count(b.bit) AS BIGINT) AS n_hits
      FROM cb LEFT JOIN bits b ON b.salt = cb.salt AND b.bit = cb.bit
      GROUP BY cb.key
    )
    SELECT key, n_hits, n_hits < {len(BLOOM_SALTS)} AS is_new FROM hits
    """,
)
def crawl_frontier_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier triage with a Bloom seen-set: history = docs with
    doc_id % 3 != 0 (their urls build the bit set); candidates = docs
    with doc_id % 2 == 0 (overlapping the history, so both outcomes
    appear). A candidate with any unoccupied position is guaranteed-new;
    the oracle replays the same salted md5 positions bit for bit."""
    docs = load(spark, sf_dir, "documents").withColumn("url", synthetic_url())
    seen = docs.filter(F.col("doc_id") % 3 != 0)
    cands = docs.filter(F.col("doc_id") % 2 == 0)
    bits = bloom_bits(seen, "url")
    return bloom_probe(cands, bits, "url")
