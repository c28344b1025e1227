"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); production target is a
multi-executor cluster over ~100 TB.  Every setting here is chosen so the
same logical plans scale: AQE for runtime re-planning and skew-join
handling, shuffle partitions sized to cores locally (cluster deployments
override via ``spark.sql.shuffle.partitions`` on submit), Arrow enabled for
the Pandas-UDF slow path, UTC session timezone so results are comparable
with external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "depositaja_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` with a pre-configured
    spark-submit environment; everything here is overridable.
    """
    # Pin BLAS to ONE thread per Python worker (r13): Spark schedules one
    # core per task, so a per-task numpy kernel must not spawn its own
    # thread pool — 32 workers × 32 OpenBLAS threads thrash catastrophically
    # on small matmuls (the jpeg IDCT's 8×8 gemms measured 6-10× slower
    # when a REUSED worker carried a live OpenBLAS pool from an earlier
    # dgemm query; bimodal per-JVM, stable within — BENCH r13 A/B).  The
    # env must be set BEFORE the JVM (and its workers) launch; setdefault
    # so a deliberate override survives.  spark.executorEnv carries the
    # same pin to cluster executors, where the reasoning is identical.
    _blas_pin = {k: os.environ.setdefault(k, "1")
                 for k in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                           "MKL_NUM_THREADS")}
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", n))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver's events.parquet stores TIMESTAMP(NANOS), which the
        # Spark parquet reader rejects; read it as long nanos and convert
        # explicitly in sources/tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # streaming state store: RocksDB keeps large keyed state off-heap,
        # the analog of the reference's per-processor LevelDB state
        # (reference collector/collector.go:35 persists to LevelDB).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    )
    for k, v in _blas_pin.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
