"""Corpus assembly for the driver contract.

The driver's tables (/root/testdata/sf*/) have no `pages` table, so the
engine builds one deterministically (BASELINE.md: "synthesise it
deterministically at small scale"):

  - `pages_from_documents`: maps the driver's `documents` table
    (doc_id, text, lang, source, n_chars) into the input_hint shape —
    url/warc_ts derived from doc_id, html = utf-8 bytes of text. These
    rows exercise the byte-identical text/plain backbone and are
    oracle-checkable in DuckDB (the same mapping is expressible in SQL).
  - `synthetic_pages`: the seeded mixed-branch corpus (datagen),
    cached as parquet under .cache/ keyed by (n, seed).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.session import REPO_ROOT

CACHE_DIR = os.path.join(REPO_ROOT, ".cache")


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/doc"),
            F.col("doc_id").cast("string"), F.lit(".txt"),
        ).alias("url"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double"))
        ).alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synthetic_pages(
    spark: SparkSession, n_docs: int, seed: int = 42
) -> DataFrame:
    """Seeded datagen corpus, cached as parquet (generation is pure
    Python; cache makes repeated sessions cheap)."""
    path = os.path.join(CACHE_DIR, "pages_n%d_s%d.parquet" % (n_docs, seed))
    if not os.path.exists(path):
        os.makedirs(CACHE_DIR, exist_ok=True)
        from readur_spark.datagen import write_pages_parquet

        tmp = path + ".tmp"
        write_pages_parquet(tmp, n_docs, seed=seed)
        os.replace(tmp, path)
    return spark.read.parquet(path)


def scaling_pages(
    spark: SparkSession, n_base: int = 2000, replicas: int = 128, seed: int = 43
) -> DataFrame:
    """CPU-representative corpus for scaling-efficiency runs: heavy
    CC-size pages (datagen.generate_scaling_pages, cached once) fanned
    out ×replicas JVM-side. Each replica gets a salted url AND payload
    suffix so sha256 dedup keeps every row — replication measures
    throughput, it must not be deduplicated away.

    The materialized corpus carries sha256 as an ingest column (the
    reference's documents.file_hash; an Iceberg column at 100 TB), so
    the dedup winner subtree is a column-pruned slim scan. 128
    replicas ≈ 256k docs / 6.3 GB: enough per-level compute that
    fixed job costs (stage boundaries, broadcast, AQE planning) stop
    dominating the N-vs-4N comparison."""
    base_path = os.path.join(CACHE_DIR, "scaling_n%d_s%d.parquet" % (n_base, seed))
    if not os.path.exists(base_path):
        os.makedirs(CACHE_DIR, exist_ok=True)
        import pyarrow.parquet as pq

        from readur_spark.datagen import generate_scaling_pages

        tmp = base_path + ".tmp"
        pq.write_table(generate_scaling_pages(n_base, seed=seed), tmp)
        os.replace(tmp, base_path)
    if replicas <= 1:
        return spark.read.parquet(base_path)

    # Materialize the replicated corpus ONCE as a 64-file parquet dir:
    # bench runs then scan a realistic multi-file input with full scan
    # parallelism — no runtime crossJoin/repartition whose 5-split base
    # scan serialized the whole job.
    full_path = os.path.join(
        CACHE_DIR, "scaling_n%d_s%d_x%d" % (n_base, seed, replicas)
    )
    if not os.path.exists(os.path.join(full_path, "_SUCCESS")):
        base = spark.read.parquet(base_path).repartition(8)
        reps = spark.range(replicas).withColumnRenamed("id", "replica")
        full = (
            base.crossJoin(reps)
            .withColumn(
                "url", F.concat("url", F.lit("#"), F.col("replica").cast("string"))
            )
            .withColumn(
                "html",
                F.concat(
                    "html",
                    F.encode(
                        F.concat(F.lit(" r"), F.col("replica").cast("string")), "utf-8"
                    ),
                ),
            )
            .drop("replica")
            .withColumn("sha256", F.sha2(F.col("html"), 256))
            .repartition(64)
        )
        full.write.mode("overwrite").parquet(full_path)
    return spark.read.parquet(full_path)


def flagship_pages(spark: SparkSession, sf_dir: str, n_synthetic: int = 500) -> DataFrame:
    """The flagship input: driver documents mapped to pages, unioned
    with the mixed-branch synthetic corpus."""
    return pages_from_documents(spark, sf_dir).unionByName(
        synthetic_pages(spark, n_synthetic)
    )
