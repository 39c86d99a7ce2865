#!/usr/bin/env python
"""spark-submit entry point for CDX-index fetch planning: CDXJ lines →
coalesced byte-range read plan.

The index-tier front door of a Common-Crawl-style run (sources/cdx.py):

    CDXJ parquet (--input, one line per capture in --line-col)
    → parse_cdxj (typed records; malformed lines -> dropped + counted)
    → [--collapse latest] newest capture per urlkey
    → [--dedup-digest] one capture per payload digest (revisit
      records share the digest of the capture they point at — their
      bytes never need fetching)
    → fetch_spans(--gap): per-WARC-file gaps-and-islands coalescing
      into contiguous ranged reads
    → partitioned plan write + one JSON summary line

    spark-submit --py-files dist/readur_spark.zip jobs/run_cdx_plan.py \
        --input /data/cdx --output /data/fetch_spans \
        [--collapse latest] [--dedup-digest] [--gap 250]

Local smoke test:
    PYTHONPATH=. python jobs/run_cdx_plan.py \
        --input /tmp/cdx --output /tmp/spans --cpus 8
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="readur_spark cdx plan job")
    p.add_argument("--input", required=True, help="parquet of CDXJ lines")
    p.add_argument("--output", required=True, help="span-plan parquet root")
    p.add_argument("--line-col", default="line")
    p.add_argument("--collapse", choices=["none", "latest"],
                   default="none",
                   help="'latest': newest capture per urlkey only")
    p.add_argument("--dedup-digest", action="store_true",
                   help="keep one capture per payload digest "
                        "(skip revisit fetches)")
    p.add_argument("--gap", type=int, default=None,
                   help="coalesce ranged reads when the hole between "
                        "members is <= this many bytes")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from readur_spark.session import get_spark

        spark = get_spark(cpus=args.cpus)

    from readur_spark.sources.cdx import (
        DEFAULT_COALESCE_GAP,
        fetch_spans,
        latest_capture,
        parse_cdxj,
    )

    lines = spark.read.parquet(args.input)
    n_lines = lines.count()
    records = parse_cdxj(lines, line_col=args.line_col).filter(
        F.col("offset").isNotNull() & F.col("filename").isNotNull()
    )
    # the plan tier is slim (no payloads) and feeds several passes —
    # cache it rather than re-parsing the line text per aggregate
    records = records.persist()
    n_records = records.count()

    if args.collapse == "latest":
        # latest_capture drops offsets; recover each winner's full
        # record by joining back on its (urlkey, capture_ts) identity
        keep = latest_capture(records).select("urlkey", "capture_ts")
        records = records.join(keep, ["urlkey", "capture_ts"])
    if args.dedup_digest:
        # earliest capture per digest owns the payload bytes
        first = records.groupBy("digest").agg(
            F.min(F.struct("capture_ts", "urlkey")).alias("k")
        ).select(
            "digest",
            F.col("k.capture_ts").alias("capture_ts"),
            F.col("k.urlkey").alias("urlkey"),
        )
        records = records.join(first, ["digest", "capture_ts", "urlkey"])

    n_planned = records.count()
    gap = args.gap if args.gap is not None else DEFAULT_COALESCE_GAP
    spans = fetch_spans(records, gap=gap)
    spans.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    stats = written.agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("filename").alias("n_files"),
        F.sum("n_records").alias("n_members"),
        F.sum("payload_bytes").alias("payload_bytes"),
        F.sum("dead_bytes").alias("dead_bytes"),
    ).first()
    print(json.dumps({
        "status": "ok",
        "output": args.output,
        "n_lines": n_lines,
        "n_records": n_records,
        "n_malformed": n_lines - n_records,
        "n_planned": n_planned,
        "n_spans": stats["n_spans"],
        "n_files": stats["n_files"],
        "n_members": stats["n_members"],
        "payload_bytes": stats["payload_bytes"],
        "dead_bytes": stats["dead_bytes"],
        "coalesce_gap": gap,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
