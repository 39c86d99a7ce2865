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


def table_row_count(sf_dir: str, name: str) -> int:
    """Row count from parquet FOOTER metadata — a driver-side read of
    the table statistic, no Spark job and no data scan (the Iceberg
    snapshot `total-records` analog). Use this wherever a query needs
    N-of-table as a constant (e.g. idf weighting) instead of
    df.count(), which launches a full-table job per query."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(
        os.path.join(sf_dir, name + ".parquet"), format="parquet"
    )
    return sum(frag.metadata.num_rows for frag in dataset.get_fragments())


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
