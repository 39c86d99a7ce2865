"""readur_spark — a PySpark-native document / web-page extraction engine.

A brand-new, Spark-first reimplementation of the extraction and query
semantics of the reference document-management engine (yonasBSD/readur,
snapshot at /root/reference — a single-node Rust server). This is NOT a
port: the reference's queue/worker/locking machinery collapses into
deterministic partitioning + snapshot-committed batch jobs, and every
per-row computation runs as an Arrow-vectorized pandas UDF over columnar
batches.

Layout
------
kernels/    pure-Python reference kernels (no Spark) — the byte-identical
            semantic contract, unit-tested against golden fixtures first
operators/  Spark operators: vectorized extraction, dedup, partitioning,
            snapshot checkpointing, metrics/lineage
queries/    the relational layer (search, facets, analytics, duplicates)
ml/         training-data pipeline ops (dedup families, ANN, text QC)
streaming/  incremental / Structured Streaming surface
"""

__version__ = "0.1.0"
