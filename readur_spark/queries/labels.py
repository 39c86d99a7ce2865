"""The labels system (B18's real data model) — labels /
document_labels / source_labels M:N tables.

Reference semantics (yonasBSD/readur):
  - schema: migrations/20250620100017_add_labels_system.sql (labels,
    document_labels, source_labels junctions; 5 seeded system labels)
  - list-with-counts query: src/routes/labels.rs:105-129 — labels LEFT
    JOIN both junctions, COUNT(DISTINCT …) per side, ORDER BY name

The driver corpus has no label tables, so they are synthesized
DETERMINISTICALLY from `documents` (BASELINE.md: synthesize at small
scale): every doc carries labels {doc_id % 5, (doc_id·7+3) % 12} and
every source carries label N % 12 (N from 'srcN') — both expressible
in SQL, so the whole surface is oracle-checked.

Scale shape: the labels dimension is tiny and broadcast; the
reference's single GROUP BY over a dl × sl join fans out
quadratically per label (its COUNT DISTINCT repairs the duplication) —
the Spark plan instead computes the two distinct-counts independently
and joins the aggregates, which is the 10^12-row-safe form. The oracle
runs the reference's literal join-fanout SQL, proving the decomposed
plan returns identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

# migrations/20250620100017 seed rows (ids collapsed to ints — the
# engine keys labels by int, not uuid; same cardinality/semantics)
LABELS: list[tuple[int, str, str, bool]] = [
    (0, "Important", "#d73a49", True),
    (1, "To Review", "#f66a0a", True),
    (2, "Archive", "#6f42c1", True),
    (3, "Work", "#0969da", True),
    (4, "Personal", "#1a7f37", True),
] + [(i, "label%d" % i, "#%06x" % (0x101010 * (i + 1)), False) for i in range(5, 12)]

N_LABELS = len(LABELS)


def labels_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        LABELS, "id int, name string, color string, is_system boolean"
    )


def _labels_values_sql() -> str:
    rows = ", ".join(
        "(%d, '%s', '%s', %s)" % (i, n, c, "TRUE" if s else "FALSE")
        for i, n, c, s in LABELS
    )
    return "labels(id, name, color, is_system) AS (VALUES %s)" % rows


def document_labels(docs: DataFrame) -> DataFrame:
    """Deterministic M:N assignment: {doc_id % 5, (doc_id·7+3) % 12}."""
    return docs.select(
        "doc_id",
        F.explode(
            F.array(
                (F.col("doc_id") % 5).cast("int"),
                F.pmod(F.col("doc_id") * 7 + 3, F.lit(N_LABELS)).cast("int"),
            )
        ).alias("label_id"),
    ).distinct()


def source_labels(docs: DataFrame) -> DataFrame:
    """One label per source: N % 12 for 'srcN'."""
    return (
        docs.select("source")
        .distinct()
        .select(
            "source",
            F.pmod(
                F.regexp_extract("source", "src(\\d+)", 1).cast("int"),
                F.lit(N_LABELS),
            ).alias("label_id"),
        )
    )


_DL_SQL = """(
      SELECT DISTINCT doc_id, CAST(doc_id % 5 AS INT) AS label_id FROM documents
      UNION
      SELECT DISTINCT doc_id, CAST((doc_id * 7 + 3) % 12 AS INT) FROM documents
    )"""

_SL_SQL = """(
      SELECT DISTINCT source,
             CAST(regexp_extract(source, 'src(\\d+)', 1) AS INT) % 12 AS label_id
      FROM documents
    )"""


@register(
    "label_counts",
    oracle=f"""
    WITH {_labels_values_sql()},
    dl AS (SELECT * FROM {_DL_SQL}),
    sl AS (SELECT * FROM {_SL_SQL})
    SELECT l.name, l.color, l.is_system,
           COUNT(DISTINCT dl.doc_id) AS document_count,
           COUNT(DISTINCT sl.source) AS source_count
    FROM labels l
    LEFT JOIN dl ON l.id = dl.label_id
    LEFT JOIN sl ON l.id = sl.label_id
    GROUP BY l.name, l.color, l.is_system
    """,
)
def label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """labels.rs:105-129 list-with-counts. The oracle runs the
    reference's literal LEFT-JOIN-both-junctions + COUNT DISTINCT SQL;
    the Spark plan aggregates each junction separately (no dl×sl
    fanout) and broadcast-joins the tiny dimension."""
    docs = load(spark, sf_dir, "documents")
    dims = labels_dim(spark)
    dcounts = (
        document_labels(docs)
        .groupBy("label_id")
        .agg(F.countDistinct("doc_id").alias("document_count"))
    )
    scounts = (
        source_labels(docs)
        .groupBy("label_id")
        .agg(F.countDistinct("source").alias("source_count"))
    )
    # broadcast the post-agg count sides (≤12 rows each) — the outer
    # side of a left join can't be the broadcast build side
    return (
        dims
        .join(F.broadcast(dcounts), dims.id == dcounts.label_id, "left")
        .drop("label_id")
        .join(F.broadcast(scounts), dims.id == scounts.label_id, "left")
        .drop("label_id")
        .select(
            "name", "color", "is_system",
            F.coalesce("document_count", F.lit(0)).alias("document_count"),
            F.coalesce("source_count", F.lit(0)).alias("source_count"),
        )
    )


@register(
    "document_label_names",
    oracle=f"""
    WITH {_labels_values_sql()},
    dl AS (SELECT * FROM {_DL_SQL})
    SELECT dl.doc_id, string_agg(l.name, ',' ORDER BY l.name) AS label_names
    FROM dl JOIN labels l ON l.id = dl.label_id
    GROUP BY dl.doc_id
    """,
)
def document_label_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document label list (the GET /documents label hydration —
    src/routes/labels.rs:230-260 shape), comma-joined sorted names so
    the value hash is order-stable."""
    docs = load(spark, sf_dir, "documents")
    dims = labels_dim(spark)
    dl = document_labels(docs)
    return (
        dl.join(F.broadcast(dims), dl.label_id == dims.id)
        .groupBy("doc_id")
        .agg(
            F.array_join(F.array_sort(F.collect_list("name")), ",").alias(
                "label_names"
            )
        )
    )
