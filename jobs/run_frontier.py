#!/usr/bin/env python
"""spark-submit entry point for crawl-frontier planning: url list →
politeness-scheduled fetch plan.

Composes the round-4 crawl tier exactly as `crawl_frontier_plan` does,
over real inputs:

    urls parquet (--url-col)
    → [--rules rules.parquet] RFC 9309 longest-match robots gate
      (ml/robots.longest_match_gate; rules schema: host, prefix, allow)
    → per-host politeness waves (queries/crawl.politeness_schedule),
      fetch offset = wave x --delay-ms
    → partitioned plan write + one JSON summary line

    spark-submit --py-files dist/readur_spark.zip jobs/run_frontier.py \
        --input /data/frontier_urls --output /data/fetch_plan \
        [--rules /data/robots_rules] [--delay-ms 1000]

Local smoke test:
    PYTHONPATH=. python jobs/run_frontier.py \
        --input /tmp/urls --output /tmp/plan --cpus 8
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="readur_spark frontier job")
    p.add_argument("--input", required=True, help="parquet of frontier urls")
    p.add_argument("--output", required=True, help="fetch-plan parquet root")
    p.add_argument("--url-col", default="url")
    p.add_argument("--rules", default=None,
                   help="parquet of robots prefix rules "
                        "(host string, prefix string, allow boolean)")
    p.add_argument("--delay-ms", type=int, default=1000,
                   help="per-host fetch delay (Crawl-delay analogue)")
    p.add_argument("--edges", default=None,
                   help="parquet of link edges (src string, dst string "
                        "matching --url-col values); enables OPIC "
                        "importance ordering within each host's waves")
    p.add_argument("--opic-iters", type=int, default=6,
                   help="OPIC sweeps over --edges")
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

    from readur_spark.ml.robots import longest_match_gate
    from readur_spark.queries.crawl import politeness_schedule

    urls = spark.read.parquet(args.input).select(
        F.col(args.url_col).alias("url"),
        F.lower(F.parse_url(F.col(args.url_col), F.lit("HOST"))).alias(
            "host"
        ),
        F.coalesce(
            F.parse_url(F.col(args.url_col), F.lit("PATH")), F.lit("/")
        ).alias("path"),
    ).filter(F.col("host").isNotNull())

    n_in = urls.count()
    n_blocked = 0
    if args.rules:
        rules = spark.read.parquet(args.rules)
        gate = longest_match_gate(urls, rules, id_col="url")
        allowed_urls = gate.filter("allowed").select("url")
        urls = urls.join(allowed_urls, "url")
        n_allowed = urls.count()
        n_blocked = n_in - n_allowed

    priority_col = None
    if args.edges:
        # OPIC cash sweeps over the link graph; importance joins the
        # frontier by url and orders each host's waves important-first
        # (ml/opic.py — hash order remains the tie-break)
        from readur_spark.ml.opic import opic_sweeps

        edges = spark.read.parquet(args.edges).select("src", "dst")
        imp = opic_sweeps(edges, args.opic_iters).select(
            F.col("node").alias("url"),
            F.col("importance").alias("opic_importance"),
        )
        urls = urls.join(imp, "url", "left").withColumn(
            "opic_importance",
            F.coalesce(F.col("opic_importance"), F.lit(0).cast("long")),
        )
        priority_col = "opic_importance"

    plan = politeness_schedule(
        urls.withColumn("delay_ms", F.lit(args.delay_ms).cast("long")),
        id_col="url",
        priority_col=priority_col,
    )
    plan.write.mode("overwrite").parquet(args.output)

    written = spark.read.parquet(args.output)
    stats = written.agg(
        F.count("*").alias("n"),
        F.countDistinct("host").alias("hosts"),
        F.max("wave").alias("max_wave"),
        F.max("offset_ms").alias("horizon_ms"),
    ).first()
    print(json.dumps({
        "status": "ok",
        "output": args.output,
        "n_input": n_in,
        "n_blocked_by_robots": n_blocked,
        "n_scheduled": stats["n"],
        "n_hosts": stats["hosts"],
        "max_wave": stats["max_wave"],
        "fetch_horizon_ms": stats["horizon_ms"],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
