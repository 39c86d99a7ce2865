"""Explicit StructType schemas — never inferSchema (SURVEY.md §1.2).

Mirrors the reference's migration-managed fixed schema
(migrations/20250620100000_initial_schema.sql) re-expressed for the
Common-Crawl input shape of BASELINE.json's input_hint.
"""

from __future__ import annotations

from pyspark.sql import types as T

# input table (BASELINE.json input_hint)
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# output of the extraction operator — the reference's documents row
# (ocr_* columns, src/models/document.rs:8-49) re-keyed by url
EXTRACTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("file_size", T.LongType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("confidence", T.FloatType(), True),
        T.StructField("word_count", T.IntegerType(), True),
        T.StructField("processing_time_ms", T.LongType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("failure_reason", T.StringType(), True),
        T.StructField("failure_stage", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("preprocessing_applied", T.ArrayType(T.StringType()), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), True),
    ]
)

# snippet struct (B10 — src/db/documents/search.rs:188-258)
SNIPPET = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("start_offset", T.IntegerType(), False),
        T.StructField("end_offset", T.IntegerType(), False),
        T.StructField(
            "highlight_ranges",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("start", T.IntegerType(), False),
                        T.StructField("end", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

# per-partition metrics rows (north_rule: docs/sec, bytes/sec,
# parse-failure counts; analog of ocr_metrics —
# migrations/20250620100001_add_ocr_queue.sql:33-46)
METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("n_completed", T.LongType(), False),
        T.StructField("n_failed", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("docs_per_sec", T.DoubleType(), False),
        T.StructField("bytes_per_sec", T.DoubleType(), False),
    ]
)

# per-partition lineage rows (north_rule resumability; analog of
# processed_images audit trail, src/models/document.rs:194-207)
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("url_hash_min", T.LongType(), True),
        T.StructField("url_hash_max", T.LongType(), True),
        T.StructField("n_docs", T.LongType(), False),
    ]
)

# attempts ledger (replaces ocr_queue —
# migrations/20250620100001_add_ocr_queue.sql:1-26)
ATTEMPTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("max_attempts", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("run_id", T.StringType(), False),
    ]
)
