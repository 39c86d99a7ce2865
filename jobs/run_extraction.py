#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline.

Packaging (north rule: "packaged for spark-submit --py-files"):

    python jobs/package.py                     # builds dist/readur_spark.zip
    spark-submit \
        --py-files dist/readur_spark.zip \
        jobs/run_extraction.py \
        --input  /data/pages_parquet_or_warc \
        --store  /data/extracted_store \
        --run-id nightly-2024-06-01 \
        [--input-format warc] [--dedup-policy skip] [--resume]

On a cluster, --input is the Iceberg/parquet pages table (or a WARC
directory) and --store the snapshot-store root on shared storage; the
same invocation re-run after a failure resumes from the last published
snapshot (content-hash resume plan). Local smoke test:

    PYTHONPATH=. python jobs/run_extraction.py \
        --input .cache/pages_n2000_s42.parquet --store /tmp/out --cpus 8
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="readur_spark extraction job")
    p.add_argument("--input", required=True, help="pages parquet path or WARC dir")
    p.add_argument("--store", required=True, help="snapshot-store root")
    p.add_argument("--run-id", default=None)
    p.add_argument("--input-format", choices=["parquet", "warc"], default="parquet")
    p.add_argument("--dedup-policy", default="skip",
                   choices=["skip", "allow_duplicate_content", "track_as_duplicate"])
    p.add_argument("--dedup-stage", default="post", choices=["pre", "post"])
    p.add_argument("--no-resume", action="store_true",
                   help="process everything even if already committed")
    p.add_argument("--no-type-filter", action="store_true",
                   help="skip the allowed-file-types ingest gate (A7)")
    p.add_argument("--license-signals", action="store_true",
                   help="attach rel=license detection (license_id, "
                        "permissive) from the raw html; columns are "
                        "echoed into the store for curation gating")
    p.add_argument("--charset-normalize", action="store_true",
                   help="WHATWG-ladder-decode text payloads and rewrite "
                        "them as clean UTF-8 before extraction (non-UTF-8 "
                        "pages survive instead of mojibake-ing)")
    p.add_argument("--cpus", type=int, default=None,
                   help="local[] cores (ignored under a real master)")
    p.add_argument("--metrics-json", default=None,
                   help="also write run metrics to this JSON file")
    args = p.parse_args(argv)

    import uuid

    from pyspark.sql import SparkSession

    # under spark-submit the session already carries the cluster conf;
    # standalone invocation falls back to the engine's local defaults
    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from readur_spark.session import get_spark

        spark = get_spark(cpus=args.cpus)

    from readur_spark.operators.checkpoint import (
        SnapshotStore,
        lineage_rows,
        resume_plan,
    )
    from readur_spark.operators.extract import partition_metrics
    from readur_spark.pipeline import extract_corpus

    run_id = args.run_id or uuid.uuid4().hex[:12]

    if args.input_format == "warc":
        from readur_spark.sources.warc import read_warc_pages

        pages = read_warc_pages(spark, args.input)
    else:
        pages = spark.read.parquet(args.input)

    # A7 — the reference enforces the allowed-types list at ingest
    # (file_service.rs:204-214), before any content is read; here the
    # gate is a JVM predicate on the url extension, ahead of the Arrow
    # boundary. --no-type-filter disables it (e.g. raw archaeology).
    if not args.no_type_filter:
        from readur_spark.operators.extract import filter_allowed_pages

        pages = filter_allowed_pages(pages)

    if args.charset_normalize:
        from readur_spark.ml.charset import normalize_page_encoding

        pages = normalize_page_encoding(pages)

    if args.license_signals:
        from pyspark.sql import functions as F

        from readur_spark.ml.license import with_license

        # html is binary; the license tag scan wants text (lenient
        # cast — the rel=license markup is ASCII on any real page)
        pages = with_license(
            pages.withColumn("_html_str", F.col("html").cast("string")),
            html_col="_html_str",
        ).drop("_html_str", "license_href")

    store = SnapshotStore(args.store)
    if not args.no_resume:
        pages = resume_plan(pages, store)
    if not pages.take(1):
        print(json.dumps({"run_id": run_id, "status": "up_to_date"}))
        return 0

    extracted = extract_corpus(
        pages, dedup_policy=args.dedup_policy, dedup_stage=args.dedup_stage
    ).cache()
    snapshot_id = store.commit(extracted, run_id)

    metrics = partition_metrics(extracted, run_id)
    lineage = lineage_rows(extracted, run_id, snapshot_id)
    metrics.write.mode("append").parquet(args.store + "/metrics")
    lineage.write.mode("append").parquet(args.store + "/lineage")

    summary_rows = metrics.groupBy().sum("n_docs", "n_failed").collect()
    n_docs, n_failed = (
        (summary_rows[0][0], summary_rows[0][1]) if summary_rows else (0, 0)
    )
    summary = {
        "run_id": run_id,
        "snapshot_id": snapshot_id,
        "status": "committed",
        "n_docs": int(n_docs or 0),
        "n_failed": int(n_failed or 0),
    }
    extracted.unpersist()
    if args.metrics_json:
        with open(args.metrics_json, "w") as f:
            json.dump(summary, f)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
