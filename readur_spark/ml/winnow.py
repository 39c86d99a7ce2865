"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm) + fingerprint-posting reuse pairs.

The guarantee-bearing member of the dedup tier: unlike MinHash (a
probabilistic whole-document similarity sketch), winnowing selects
the minimum k-gram hash in every sliding window of w consecutive
k-grams, which GUARANTEES that any shared substring of length
>= w + k - 1 contributes at least one shared fingerprint — the local
text-reuse detector (quotes, mirrored paragraphs, license blocks)
that whole-doc sketches miss.

Deviation from the paper, documented: ties select the LEFTMOST
minimal hash in the window (min over (hash, pos) structs) rather than
the rightmost — deterministic in both engines, detection guarantee
unchanged.

Reference tie-in: the reference's duplicate detection is whole-file
sha256 (db/documents duplicate groups); winnowing is the
sub-document-granularity extension its corpus tier lacks.

Scale design:
  - k-gram explode happens JVM-side (sequence + substring projection
    over a CAPPED prefix — the fingerprint head is a bounded-cost
    signature, like the LSH shingle cap);
  - window selection is ONE per-document frame min (partitioned
    window, frames of w rows) — per-doc local sort, no global sort;
  - reuse pairs come from a df-capped posting join on the fingerprint
    hash (hot fingerprints — boilerplate — are dropped by cap, the
    same guard as the n-gram Jaccard join) — never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

K_GRAM = 5        # noise threshold: matches shorter than k never count
W_WINDOW = 8      # guarantee threshold t = w + k - 1 = 12 chars
PREFIX_CAP = 120  # fingerprint the first N chars (bounded signature)
PAIR_DF_CAP = 20  # fingerprints in more docs than this are boilerplate
MIN_SHARED = 3    # report pairs with >= this many shared fingerprints
# (single shared fingerprints are word-level coincidence on a natural-
# language corpus — measured ~20k 1-fp pairs vs ~300 >= 3-fp pairs at
# both sf0.001 and sf0.01; the threshold keeps the report O(real reuse))


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = K_GRAM,
    w: int = W_WINDOW,
    prefix_cap: int = PREFIX_CAP,
) -> DataFrame:
    """(id, pos, fp) — selected fingerprints of each document's first
    `prefix_cap` chars: fp = 60-bit md5-derived hash of the k-gram at
    1-based char position pos, chosen as the (hash, pos)-min of some
    full window of w consecutive k-grams."""
    s = F.substring(F.col(text_col), 1, prefix_cap)
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]) —
            # short texts must yield no grams, not phantom positions
            F.when(
                F.length(s) >= k,
                F.sequence(F.lit(1), F.length(s) - (k - 1)),
            ).otherwise(F.expr("array()").cast("array<int>"))
        ).alias("pos"),
        s.alias("_s"),
        F.length(s).alias("_len"),
    ).select(
        "id",
        "pos",
        "_len",
        F.conv(
            F.substring(
                F.md5(F.encode(F.expr(f"substring(_s, pos, {k})"), "UTF-8")),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    frame = (
        Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    )
    sel = grams.select(
        "id",
        "pos",
        "_len",
        F.min(F.struct("h", "pos")).over(frame).alias("m"),
    ).filter(
        # full windows only: start positions 1 .. n_grams - w + 1
        F.col("pos") <= F.col("_len") - (k - 1) - (w - 1)
    )
    return (
        sel.select("id", F.col("m.pos").alias("pos"), F.col("m.h").alias("fp"))
        .distinct()
    )


def winnow_reuse_pairs(
    fps: DataFrame, *, df_cap: int = PAIR_DF_CAP, min_shared: int = 1
) -> DataFrame:
    """(id_a, id_b, n_shared >= min_shared) — document pairs sharing
    selected fingerprints, via a df-capped posting join on fp (hot
    fingerprints are boilerplate and are dropped, bounding join fanout
    exactly like the Jaccard shingle join)."""
    # persist the slim (id, fp) posting frame: it feeds the df agg and
    # BOTH sides of the self-join, and its lineage (explode + md5 +
    # window-min + distinct over the corpus) is the expensive part —
    # unpersisted, Spark recomputes that subtree 4x (measured: four
    # Generate/Window spans, zero ReusedExchange). ~25 rows/doc of two
    # longs, so the cache is a small fraction of corpus size.
    posts = fps.select("id", "fp").distinct().persist()
    df_ok = (
        posts.groupBy("fp")
        .agg(F.countDistinct("id").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= df_cap))
        .select("fp")
    )
    # shuffle join, NOT broadcast: df_ok is every fingerprint with df
    # in [2, cap] — it grows with the corpus, so a broadcast would be
    # the frequent-line-literal mistake at 100 TB. AQE may still elect
    # broadcast at small scale; at large scale both sides hash on fp.
    slim = posts.join(df_ok, "fp")
    a, b = slim.alias("a"), slim.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---- oracle twins ----------------------------------------------------------

def _grams_sql(k: int, cap: int) -> str:
    return f"""
    base AS (
      SELECT doc_id AS id, substr(text, 1, {cap}) AS s
      FROM documents
    ),
    grams AS (
      SELECT id, i.i AS pos, len(s) AS slen,
             CAST(concat('0x', substr(md5(substr(s, i.i, {k})), 1, 15))
                  AS BIGINT) AS h
      FROM base,
           UNNEST(range(1, greatest(len(s) - {k - 1}, 0) + 1)) AS i(i)
    )"""


def _fp_sql(k: int, w: int, cap: int) -> str:
    """Selected fingerprints via the two-step leftmost-min replay:
    per-window min hash, then the smallest position attaining it."""
    return f"""
    WITH {_grams_sql(k, cap)},
    wins AS (
      SELECT g.id, j.pos AS wstart, min(g.h) AS mh
      FROM grams j
      JOIN grams g
        ON g.id = j.id AND g.pos BETWEEN j.pos AND j.pos + {w - 1}
      WHERE j.pos <= j.slen - {k - 1} - {w - 1}
      GROUP BY g.id, j.pos
    ),
    sel AS (
      SELECT DISTINCT w.id, g.h AS fp, min(g.pos) AS pos
      FROM wins w
      JOIN grams g
        ON g.id = w.id AND g.h = w.mh
       AND g.pos BETWEEN w.wstart AND w.wstart + {w - 1}
      GROUP BY w.id, w.wstart, g.h
    )
    SELECT DISTINCT id, pos, fp FROM sel
    """


@register(
    "winnow_fingerprint_rollup",
    oracle=f"""
    WITH fps AS ({_fp_sql(K_GRAM, W_WINDOW, PREFIX_CAP)})
    SELECT id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_fp,
           CAST(sum(fp // 256) AS BIGINT) AS sum_h,
           min(fp) AS min_h, max(fp) AS max_h
    FROM fps GROUP BY id
    """,
)
def winnow_fingerprint_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint rollup, value-hash-checked:
    the DuckDB twin replays k-gram hashing, every window min, and the
    leftmost tie-break; the rollup (count + shifted-sum + min/max of
    the selected hashes) pins the exact selected SET per doc without
    shipping ~25 rows/doc through the driver compare."""
    docs = load(spark, sf_dir, "documents")
    fps = winnow_fingerprints(docs)
    return fps.groupBy(F.col("id").alias("doc_id")).agg(
        F.count("*").alias("n_fp"),
        F.sum(F.expr("fp div 256")).alias("sum_h"),
        F.min("fp").alias("min_h"),
        F.max("fp").alias("max_h"),
    )


@register(
    "winnow_reuse_pairs",
    oracle=f"""
    WITH fps AS ({_fp_sql(K_GRAM, W_WINDOW, PREFIX_CAP)}),
    posts AS (SELECT DISTINCT id, fp FROM fps),
    ok AS (
      SELECT fp FROM posts GROUP BY fp
      HAVING count(DISTINCT id) BETWEEN 2 AND {PAIR_DF_CAP}
    ),
    slim AS (SELECT p.id, p.fp FROM posts p JOIN ok USING (fp))
    SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM slim a JOIN slim b ON a.fp = b.fp AND a.id < b.id
    GROUP BY a.id, b.id
    HAVING count(*) >= {MIN_SHARED}
    """,
)
def winnow_reuse_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local text-reuse pairs from shared winnowing fingerprints —
    every substring match >= w + k - 1 chars inside the capped prefix
    is guaranteed to surface at least one shared fingerprint, so
    exact-dup documents always pair (and clear MIN_SHARED easily:
    identical prefixes share the whole selected set). Whole chain
    value-hashed."""
    docs = load(spark, sf_dir, "documents")
    pairs = winnow_reuse_pairs(winnow_fingerprints(docs), min_shared=MIN_SHARED)
    return pairs.select("id_a", "id_b", "n_shared")
