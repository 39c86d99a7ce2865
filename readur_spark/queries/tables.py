"""Table loading helpers for the query layer."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, name + ".parquet"))


# The synthetic url every documents-derived query shares (one source of
# truth; its SQL twin must stay textually in sync for oracle parity).
SYNTH_URL_SQL = "'https://' || source || '.example/doc' || doc_id || '.txt'"


def synthetic_url():
    """Column twin of SYNTH_URL_SQL."""
    from pyspark.sql import functions as F

    return F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example/doc"),
        F.col("doc_id").cast("string"), F.lit(".txt"),
    )
