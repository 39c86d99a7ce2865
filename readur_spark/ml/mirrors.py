"""Host mirror detection via shared content hashes.

Mirror sites (same corpus served from many hosts — software docs,
Wikipedia dumps, spam networks) defeat per-host caps and diversity
accounting: each mirror looks like an independent domain while
shipping identical bytes.  The standard curation counter (the
site-collapse step in CCNet-style pipelines) detects host PAIRS whose
document sets overlap heavily by exact content hash and collapses
them before domain capping.

Semantics, exact integers end-to-end:

  shared(a,b)       = |{sha: both hosts hold a doc with that sha}|
  mirror_permille   = 1000·shared div min(|a|, |b|)   (containment,
                      so a small full mirror of a big host still
                      scores 1000)
  is_mirror         = mirror_permille ≥ 500

Scale design: the self-join runs on the (sha, host) frame AFTER
collapsing to distinct pairs — only shas held by ≥2 hosts survive
the pre-filter, so the join input is the duplicate tail, not the
corpus; the pair rollup is map-side combinable; nothing payload-
sized shuffles.  Reference analogue: readur's exact sha256 dedup
policies (SURVEY §2 A5/A6) lifted from file pairs to host pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

MIRROR_PERMILLE = 500


def host_mirror_pairs(
    df: DataFrame, *, host_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(host_a, host_b, shared, n_a, n_b, mirror_permille, is_mirror)
    for host pairs sharing ≥1 exact content hash."""
    hs = df.select(
        F.col(host_col).alias("host"),
        F.sha2(F.col(text_col), 256).alias("sha"),
    ).distinct()
    sizes = hs.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # duplicate tail only: shas on ≥2 hosts
    multi = (
        hs.groupBy("sha")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") >= 2)
        .select("sha")
    )
    slim = hs.join(multi, "sha", "left_semi")
    pairs = (
        slim.alias("a")
        .join(slim.alias("b"), "sha")
        .filter(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"),
            F.col("b.host").alias("host_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    out = (
        pairs.join(
            sizes.select(
                F.col("host").alias("host_a"), F.col("n").alias("n_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("host").alias("host_b"), F.col("n").alias("n_b")
            ),
            "host_b",
        )
        .withColumn(
            "mirror_permille",
            F.expr("(1000L * shared) div least(n_a, n_b)"),
        )
        .withColumn(
            "is_mirror", F.col("mirror_permille") >= MIRROR_PERMILLE
        )
    )
    return out.select(
        "host_a", "host_b", "shared", "n_a", "n_b", "mirror_permille",
        "is_mirror",
    )


# ---- constructed mirror corpus (SQL-twinnable ground truth) ---------------
#
# The synthetic documents are unique per row, so the natural corpus
# has no cross-host duplicates — the query would be vacuous. The
# constructed rule (both engines replay it) reassigns hosts and
# content to produce all three regimes:
#   host m0 vs m3: every doc pair 6k / 6k+3 shares blob k → full
#                  mirror (permille 1000, flagged);
#   host m1 vs m4: docs share semi-blob k only when k % 3 == 0 →
#                  partial overlap (~333‰, below the 500 flag);
#   hosts m2, m5:  unique text → no pair rows at all.


def constructed_mirror_docs(df: DataFrame) -> DataFrame:
    host = F.concat(F.lit("m"), (F.col("doc_id") % 6).cast("string"))
    k = F.expr("doc_id div 6")
    text = (
        F.when(
            F.expr("doc_id % 6 in (0, 3)"),
            F.concat(F.lit("blob-"), k.cast("string")),
        )
        .when(
            F.expr("doc_id % 6 in (1, 4) and (doc_id div 6) % 3 = 0"),
            F.concat(F.lit("semi-"), k.cast("string")),
        )
        .otherwise(
            F.concat(F.lit("uniq-"), F.col("doc_id").cast("string"))
        )
    )
    return df.select(host.alias("source"), text.alias("text"))


_CONSTRUCT_SQL = """
  SELECT 'm' || CAST(doc_id % 6 AS VARCHAR) AS source,
         CASE WHEN doc_id % 6 IN (0, 3)
              THEN 'blob-' || CAST(doc_id // 6 AS VARCHAR)
              WHEN doc_id % 6 IN (1, 4) AND (doc_id // 6) % 3 = 0
              THEN 'semi-' || CAST(doc_id // 6 AS VARCHAR)
              ELSE 'uniq-' || CAST(doc_id AS VARCHAR) END AS text
  FROM documents
"""

_ORACLE = f"""
WITH docs AS ({_CONSTRUCT_SQL}),
hs AS (
  SELECT DISTINCT source AS host, sha256(text) AS sha FROM docs
), sizes AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n FROM hs GROUP BY host
), multi AS (
  SELECT sha FROM hs GROUP BY sha HAVING count(*) >= 2
), slim AS (
  SELECT hs.* FROM hs JOIN multi USING (sha)
), pairs AS (
  SELECT a.host AS host_a, b.host AS host_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM slim a JOIN slim b ON a.sha = b.sha AND a.host < b.host
  GROUP BY a.host, b.host
)
SELECT p.host_a, p.host_b, p.shared, sa.n AS n_a, sb.n AS n_b,
       CAST((1000 * p.shared) // least(sa.n, sb.n) AS BIGINT)
         AS mirror_permille,
       (1000 * p.shared) // least(sa.n, sb.n) >= {MIRROR_PERMILLE}
         AS is_mirror
FROM pairs p
JOIN sizes sa ON p.host_a = sa.host
JOIN sizes sb ON p.host_b = sb.host
"""


@register("host_mirror_constructed", oracle=_ORACLE)
def host_mirror_constructed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host mirror pairs over the constructed mirror corpus,
    value-hashed: DuckDB replays the host/content construction, the
    distinct (host, sha) frame, the duplicate-tail pre-filter, the
    pair join, and the containment arithmetic — the full-mirror,
    partial-overlap, and no-overlap regimes all present. (Spark sha2
    and DuckDB sha256 agree on hex output.)"""
    docs = constructed_mirror_docs(load(spark, sf_dir, "documents"))
    return host_mirror_pairs(docs)
