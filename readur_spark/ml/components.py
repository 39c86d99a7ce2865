"""Connected components over near-duplicate pair lists — the step that
turns pairwise candidates (exact, Jaccard, MinHash-LSH, SimHash) into
dedup *clusters* ("keep one representative per component"), which is
what a production web-corpus dedup actually materializes.

Algorithm: iterative min-label propagation (the alternating-star
family's simple member): every node starts labeled with itself; each
round, labels flow across edges and every node keeps the minimum label
seen. Converges in O(diameter) rounds — near-dup graphs are
overwhelmingly small dense cliques (recrawls/boilerplate families), so
diameter is tiny; the iteration cap guards pathological chains.

Scale shape: each round is two shuffles over the SLIM (id, comp) /
(a, b) frames — never payloads; `localCheckpoint` cuts lineage each
round so the plan doesn't grow (on a cluster, `checkpoint` to durable
storage instead, making long component jobs resumable). The per-round
`changed` count is a bounded driver scalar (a legitimate collect).

The DuckDB oracle computes the same components via a recursive CTE
(min label over the transitive closure), so the whole operator is
value-hash-checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """pairs(id_a, id_b) → (id, comp) with comp = min node id of the
    component. Nodes = every id appearing in a pair (isolated docs are
    their own trivial component and are omitted — the caller unions
    them back if needed)."""
    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = sym.join(labels, sym["a"] == labels["id"]).select(
            F.col("b").alias("id"), F.col("comp")
        )
        new_labels = (
            labels.union(prop).groupBy("id").agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") < F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def component_summary(labels: DataFrame, min_size: int = 2) -> DataFrame:
    """(comp → size) for non-trivial clusters: the duplicate-groups
    shape (B17) generalized from exact-hash groups to near-dup
    components."""
    return (
        labels.groupBy("comp")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") >= min_size)
    )


# ---- registered query -------------------------------------------------------

from readur_spark.queries.registry import register  # noqa: E402
from readur_spark.queries.tables import load  # noqa: E402

# Demo pair source: unigram Jaccard ≥ 0.8 within (lang, source) blocks
# with a df-capped posting join (the cap keeps the guard in the plan;
# the synthetic 31-word vocabulary needs the headroom to produce a
# non-trivial graph). In production the pair input is the MinHash-LSH
# candidate list — components is pair-source-agnostic.
_PAIR_SQL = """
toks0 AS (
  SELECT doc_id AS id, lang, source,
         unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
), capped AS (
  SELECT token FROM (SELECT token, count(*) AS c FROM toks0 GROUP BY token)
  WHERE c <= 450
), toks AS (
  SELECT toks0.* FROM toks0 SEMI JOIN capped USING (token)
), sizes AS (
  SELECT id, count(*) AS sz FROM toks GROUP BY id
), p0 AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM toks a JOIN toks b
    ON a.token = b.token AND a.lang = b.lang AND a.source = b.source
  WHERE a.id < b.id
  GROUP BY a.id, b.id
), pairs AS (
  SELECT p.id_a, p.id_b
  FROM p0 p JOIN sizes sa ON sa.id = p.id_a JOIN sizes sb ON sb.id = p.id_b
  WHERE CAST(p.inter AS DOUBLE) / (sa.sz + sb.sz - p.inter) >= 0.8
)"""


@register(
    "dedup_near_components",
    oracle=f"""
    WITH RECURSIVE {_PAIR_SQL},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id
      WHERE r.comp < e.b
    ),
    comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
    SELECT comp AS cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
    FROM comps GROUP BY comp HAVING count(*) >= 2
    """,
)
def dedup_near_components(spark, sf_dir: str) -> DataFrame:
    """Near-dup clusters: Jaccard pair list → min-label components →
    per-cluster sizes. The oracle re-derives the identical components
    with a recursive-CTE transitive closure, so convergence and label
    choice are value-hash-checked, not assumed."""
    from readur_spark.ml.dedup import jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs, "doc_id", "text", ["lang", "source"],
        threshold=0.8, df_cap=450, n_shingle=1,
    )
    labels = connected_components(pairs)
    return component_summary(labels).select(
        F.col("comp").alias("cluster_id"), F.col("cluster_size")
    )


def keep_best_per_component(
    labels: DataFrame,
    quality: DataFrame,
    *,
    id_col: str = "id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Representative selection: within each component keep the
    highest-`quality_col` document (tie → min id). Production web
    dedup keeps the LONGEST member of a duplicate cluster, not an
    arbitrary one — the syndicated copies and truncated mirrors lose
    to the canonical full page (RefinedWeb §3.3's convention).

    One window over the slim (id, comp, quality) frame; payloads never
    enter the shuffle."""
    from pyspark.sql import Window

    sized = labels.join(quality, labels[id_col] == quality[id_col]).select(
        labels[id_col].alias("id"), "comp", quality_col
    )
    w = Window.partitionBy("comp").orderBy(
        F.col(quality_col).desc(), F.col("id")
    )
    return sized.withColumn("rn", F.row_number().over(w)).select(
        F.col("id"),
        F.col("comp"),
        F.col(quality_col),
        (F.col("rn") == 1).cast("int").alias("keep"),
    )


@register(
    "neardup_keep_longest",
    oracle=f"""
    WITH RECURSIVE {_PAIR_SQL},
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.id
      WHERE r.comp < e.b
    ),
    comps AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
    ranked AS (
      SELECT c.id, c.comp, CAST(length(d.text) AS BIGINT) AS n_chars,
             row_number() OVER (PARTITION BY c.comp
                                ORDER BY length(d.text) DESC, c.id) AS rn
      FROM comps c JOIN documents d ON d.doc_id = c.id
    )
    SELECT id AS doc_id, comp AS cluster_id, n_chars,
           CAST(rn = 1 AS INT) AS keep
    FROM ranked
    """,
)
def neardup_keep_longest(spark, sf_dir: str) -> DataFrame:
    """Quality-aware dedup representatives: same pair list and
    components as `dedup_near_components`, but every member row comes
    out with its keep/drop verdict — the longest document (tie → min
    doc_id) survives each cluster. Component labels, lengths, and the
    verdicts are all value-hashed in DuckDB."""
    from readur_spark.ml.dedup import jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    pairs = jaccard_pairs(
        docs, "doc_id", "text", ["lang", "source"],
        threshold=0.8, df_cap=450, n_shingle=1,
    )
    labels = connected_components(pairs)
    quality = docs.select(
        F.col("doc_id").alias("id"),
        F.length("text").cast("long").alias("n_chars"),
    )
    kept = keep_best_per_component(labels, quality)
    return kept.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        "n_chars",
        "keep",
    )
