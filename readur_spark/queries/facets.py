"""Facets, conditional counts, pagination, duplicate groups
(SURVEY.md §2 B3, B13-B15, B17).

All stock hash-aggregations — partial (map-side) combine makes these
the cheapest operator family at scale; the only design decision is key
cardinality (facet keys are low-cardinality → tiny shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


@register(
    "facet_source_counts",
    oracle="""
    SELECT source, count(*) AS n
    FROM documents
    GROUP BY source
    """,
)
def facet_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 mime-facet shape (src/db/documents/management.rs:150-164)."""
    return load(spark, sf_dir, "documents").groupBy("source").agg(
        F.count("*").alias("n")
    )


@register(
    "facet_token_explode",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    HAVING count(*) > 200
    """,
)
def facet_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 unnest-facet shape (management.rs:167-181): explode +
    count + threshold."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 200)
    )


@register(
    "status_conditional_counts",
    oracle="""
    SELECT count(*) AS n_total,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
           count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
           count(CASE WHEN value >= 80 THEN 1 END) AS n_high_value,
           count(CASE WHEN event_type = 'error' AND value < 50 THEN 1 END) AS n_error_low
    FROM events
    """,
)
def status_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 COUNT(CASE WHEN …) accounting
    (src/db/documents/operations.rs:251-273)."""
    ev = load(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.count(F.when(F.col("event_type") == "signup", 1)).alias("n_signup"),
        F.count(F.when(F.col("value") >= 80, 1)).alias("n_high_value"),
        F.count(
            F.when((F.col("event_type") == "error") & (F.col("value") < 50), 1)
        ).alias("n_error_low"),
    )


def paginate(
    df: DataFrame, order_cols: list, page: int, settings: dict | None = None
) -> DataFrame:
    """B3 LIMIT/OFFSET after ORDER BY (src/db/documents/helpers.rs:72-77)
    — page size from the per-user search_results_per_page knob
    (src/models/settings.rs:326), offset via a row_number window
    (deterministic given a unique tie-break in order_cols)."""
    from readur_spark.kernels.settings import DEFAULT_SETTINGS

    per_page = int(
        (settings or {}).get(
            "search_results_per_page", DEFAULT_SETTINGS["search_results_per_page"]
        )
    )
    w = Window.orderBy(*order_cols)
    lo, hi = (page - 1) * per_page, page * per_page
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > lo) & (F.col("rn") <= hi))
        .drop("rn")
    )


@register(
    "pagination_page2",
    oracle="""
    SELECT doc_id, n_chars
    FROM (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    )
    WHERE rn > 25 AND rn <= 50
    """,
)
def pagination_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 at the default 25-per-page (knob-driven via paginate)."""
    docs = load(spark, sf_dir, "documents")
    return paginate(
        docs.select("doc_id", "n_chars"),
        [F.desc("n_chars"), F.asc("doc_id")],
        page=2,
    )


@register(
    "duplicate_groups",
    oracle="""
    SELECT md5(props) AS group_hash,
           count(*) AS duplicate_count,
           min(event_id) AS first_id,
           max(event_id) AS last_id
    FROM events
    GROUP BY md5(props)
    HAVING count(*) > 1
    """,
)
def duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 duplicate-groups (management.rs:87-147): the reference's
    CTE + self-join collapses to one agg; keyed on content hash
    (events.props plays the payload role — documents has no exact
    dups; synthetic pages cover the sha256 case in pytest)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.md5(F.col("props")).alias("group_hash"))
        .agg(
            F.count("*").alias("duplicate_count"),
            F.min("event_id").alias("first_id"),
            F.max("event_id").alias("last_id"),
        )
        .filter(F.col("duplicate_count") > 1)
    )
