"""SparkSession factory with the engine's scale-oriented defaults.

Local-mode testing stands in for a multi-executor cluster; every knob
here is chosen to survive a 1000-executor / 100 TB deployment:
  - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
  - Arrow enabled with bounded batch size (pandas-UDF memory ceiling is
    maxRecordsPerBatch × avg row width — html payloads are KB-MB scale,
    so 512 rows/batch keeps executor memory flat)
  - shuffle partitions sized to cores locally; on a real cluster set
    spark.sql.shuffle.partitions ≈ 2-3× total cores or rely on AQE
    coalescing from a higher initial number
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _default_driver_memory() -> str:
    """Size the local-mode heap to the host, not to a fixed benchmark
    box: half of physical RAM, clamped to [4g, 48g]. On a host with
    less RAM than the old fixed 48g default the JVM would otherwise
    grow past physical memory and get OOM-killed/swapped instead of
    GC-ing. SPARK_DRIVER_MEMORY still overrides for bench runs."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) // (1024 * 1024)
                    return "%dg" % max(4, min(48, total_gb // 2))
    except OSError:
        pass
    return "8g"


def get_spark(
    cpus: int | None = None,
    app_name: str = "readur_spark",
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # executors (local-mode python workers) must import readur_spark
    os.environ.setdefault("PYTHONPATH", REPO_ROOT)
    if REPO_ROOT not in os.environ.get("PYTHONPATH", ""):
        os.environ["PYTHONPATH"] = REPO_ROOT + os.pathsep + os.environ["PYTHONPATH"]

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.default.parallelism", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing is the dominant UDF-throughput knob
        # (measured: 512-row batches cost 2.5× wall vs 8192 on CC-size
        # pages — per-batch serialization overhead dominates). Records
        # cap serves tiny rows; the byte cap bounds executor/worker
        # memory when MB-scale payloads appear in a batch. The cap must
        # be SMALL: at 64 MB × 32 concurrent python workers the anon
        # page churn (batch + pickle + pandas copies per worker) drove
        # the same clear_page_erms stalls as the 4096-row columnar
        # reader — measured 300-900 docs/s at 32 cores vs 4,700-5,900
        # at a 2-4 MB cap on identical plans (BASELINE.md round 4).
        # Workers pipeline batches, so small batches lose no overlap.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            str(int(os.environ.get("SPARK_GRAFT_ARROW_MAX_MB", "4")) * 1024 * 1024),
        )
        # local mode: the driver JVM hosts every task — size heap to the
        # box, not to a cluster-driver default. 32 concurrent tasks over
        # MB-scale binary rows at 8g = ~250MB/task → GC thrash; half of
        # host RAM (capped 48g) keeps task working sets + shuffle
        # buffers off the GC cliff without outgrowing physical memory.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        # binary payloads can be MB-scale: keep scan partitions bounded
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Columnar-reader batch: the default 4096 rows × ~25 KB binary
        # payloads = ~100 MB of on-heap byte arrays per batch PER TASK
        # (3+ GB across 32 tasks) — measured 10-37× slowdowns feeding
        # Arrow stages on this host, with guest soft lockups in
        # alloc_anon_folio/clear_page_erms under host memory pressure
        # (BASELINE.md round 4). 256 rows keeps per-task batches at
        # ~6 MB with no vectorization loss on wide-payload tables.
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
