"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship extraction pipeline on sf0.001 + synthetic
                mixed-branch corpus → per-(status, mime_type) rollup.
queries()     — one entry per implemented operator (SURVEY.md §2);
                each callable (spark, sf_dir) → DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query key (same column
                aliases — the driver hash-compares values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages (documents-derived + synthetic mixed corpus) →
    dedup → url-hash partition → vectorized extraction → rollup."""
    from pyspark.sql import functions as F

    from readur_spark.corpus import flagship_pages
    from readur_spark.pipeline import extract_corpus

    pages = flagship_pages(spark, SF0001, n_synthetic=500)
    extracted = extract_corpus(pages)
    return (
        extracted.groupBy("status", "mime_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("word_count").alias("total_words"),
            F.avg("confidence").alias("avg_confidence"),
        )
        .orderBy("status", "mime_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from readur_spark.queries import registry

    return registry.queries()


def oracle_sql() -> dict[str, str]:
    from readur_spark.queries import registry

    return registry.oracle_sql()
