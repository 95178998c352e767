"""SparkSession factory with scale-aware defaults.

Local mode is the test harness; the confs are chosen so the SAME code runs
on a 1000-executor cluster: AQE on (runtime skew-join splitting + partition
coalescing), Arrow enabled for the pandas-UDF gather-scatter path, UTC
session timezone so results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: glibc malloc tuning inherited by every forked Python worker. The
#: vectorized kernels allocate large numpy temporaries each call; with
#: glibc's default 128 KB mmap threshold those come from mmap and are
#: munmap'd on free, so EVERY task re-faults hundreds of MB of fresh
#: anonymous pages. On virtualized hosts page zeroing can be the
#: binding resource (this box faults ~1 GB/s aggregate across 32
#: workers — measured, see BENCH.md malloc-tuning section), which made
#: kernels 5-10x slower than their arithmetic. Raising the mmap and
#: trim thresholds keeps buffers <=256 MB in the worker's heap, where
#: they are REUSED across tasks (Spark reuses Python workers): pages
#: fault once per worker lifetime, not once per task. Exported before
#: the JVM starts so pyspark.daemon -> worker forks inherit them.
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(256 << 20),
    "MALLOC_TRIM_THRESHOLD_": str(256 << 20),
}


def _tune_malloc() -> None:
    for k, v in _MALLOC_ENV.items():
        os.environ.setdefault(k, v)
    try:  # same tuning for THIS process (env is read at libc startup)
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 256 << 20)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 256 << 20)  # M_TRIM_THRESHOLD
    except Exception:
        pass  # non-glibc platform; env vars are simply ignored


def get_spark(
    app_name: str = "kgraph_framework_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    _tune_malloc()
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # UI off by default (headless benches); SPARK_GRAFT_UI=1 enables
        # it so profiling probes can read per-stage metrics over REST
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        # Iterative jobs (NN-descent, Pregel loops) leave each round's
        # shuffle files on disk until the ContextCleaner notices the
        # stage's RDDs are unreachable — which only happens on a DRIVER
        # JVM GC. Spark's default periodicGC.interval of 30min let a
        # 6-round 1M-vector build accumulate >80 GB of dead shuffle data
        # and fill the disk. Both loop drivers now reclaim EXPLICITLY at
        # their own round boundaries (plans/pregel.reclaim_shuffles: NN-
        # descent every round, run_supersteps time-throttled), so the
        # periodic sweep is only the safety net for ad-hoc jobs — 5min
        # bounds those to a few rounds of dead files while costing long
        # second-scale superstep runs at most one full-GC pause per 5min
        # (the earlier 90s net hit a 100M-edge PageRank every ~3rd
        # superstep and doubled its steady per-step wall; BENCH.md).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "5min"),
        )
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        # e.g. /dev/shm/spark-local: keeps shuffle files off spinning
        # storage when benchmarking on a single box
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally created session.

    The verification driver hands us its own SparkSession; these confs are
    all runtime-mutable and required for oracle parity (UTC timestamps) and
    sane small-scale plans.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    except Exception:
        pass  # static conf on some builds; defaults are fine
    return spark
