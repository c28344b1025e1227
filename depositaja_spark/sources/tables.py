"""Parquet test-table loaders.

The driver's tables (TESTDATA.md) are single parquet files per table.
Reads are plain ``spark.read.parquet`` so Catalyst gets native pushdown,
column pruning, and partition-splitting for free — at 100 TB these would be
directory-partitioned datasets and the same code applies unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from depositaja_spark.schemas import TEST_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: memoized (applicationId, sf_dir, table) → analyzed DataFrame.  Every
#: query build pays a parquet footer read + py4j round-trip per table it
#: loads (~50 ms each; a 6-table join re-reads 6 footers per build) —
#: but the driver's test tables are immutable for a session's lifetime,
#: and a DataFrame is an immutable lazy plan, so the loaded frame is
#: safely reusable across queries.  Keyed by applicationId so a new
#: SparkSession never sees a stale frame.  NOTE this pins the read-time
#: file listing: if a caller ever pointed load_table at a directory it
#: rewrites mid-session it must bypass this cache (no such caller
#: exists; all call sites read the driver's static sf dirs).
_LOAD_CACHE: dict[tuple[str, str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the session timeZone is part of the key: the NTZ→LTZ normalization
    # guard below must re-run (and re-raise) if the zone changes after a
    # frame was cached under UTC
    app_id = spark.sparkContext.applicationId
    key = (
        app_id,
        spark.conf.get("spark.sql.session.timeZone"),
        os.path.abspath(sf_dir),
        name,
    )
    hit = _LOAD_CACHE.get(key)
    if hit is not None:
        return hit
    # evict entries from other applications: their sessions are stopped
    # (or stopping), the plans are unusable, and a driver that restarts
    # sessions must not grow the dict without bound
    for stale in [k for k in _LOAD_CACHE if k[0] != app_id]:
        del _LOAD_CACHE[stale]
    df = _load_table_uncached(spark, sf_dir, name)
    _LOAD_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (``region nation customer supplier part orders
    lineitem events documents embeddings``) from ``sf_dir``.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as long nanos and
    is converted here to a microsecond TimestampType (integer division, the
    same ns→µs truncation DuckDB applies), keeping the published schema
    stable for every consumer.

    Timestamps written WITHOUT ``isAdjustedToUTC`` surface as
    TIMESTAMP_NTZ on Spark 4; those are normalized to TimestampType here.
    The session timezone is UTC (session.py), so the cast keeps the
    stored micros bit-identical — the same as-if-UTC reading DuckDB
    applies to naive parquet timestamps, and the same values the driver's
    UTC-adjusted generations produce.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer `div`, not `/`: epoch-nanos exceed double's 53-bit mantissa,
        # so float division can truncate to the wrong microsecond
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # NTZ→LTZ is bit-identical only under a UTC session zone; a non-UTC
    # session would silently shift wall-clock values, so fail loudly.
    # Top-level fields only by design: no nested timestamp columns exist in
    # the driver's tables (TESTDATA.md), and nested normalization would need
    # a recursive rebuild this loader deliberately avoids.
    if any(isinstance(f.dataType, T.TimestampNTZType) for f in df.schema.fields):
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise ValueError(
                f"load_table requires a UTC session timezone for NTZ "
                f"normalization; got {tz!r} (use session.get_spark())"
            )
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampNTZType):
                # concrete type, not cast("timestamp"): the string alias
                # resolves via spark.sql.timestampType and would no-op if a
                # caller overrides that conf to TIMESTAMP_NTZ
                df = df.withColumn(f.name, F.col(f.name).cast(T.TimestampType()))
    return df


#: spread() sizing: one task per this many SOURCE bytes.  Tuned for the
#: compute-heavy consumers (shingling/hashing explode bytes ~10×): small
#: enough that a few-MB fixture still fans out, large enough that tiny
#: frames don't pay 32 tasks of scheduler overhead for µs of work
#: (measured: 8–16 tasks beat 32 by ~20% on the sf0.1 doc queries).
SPREAD_BYTES_PER_TASK = 256 * 1024


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition sized to the input, capped at executor
    parallelism.

    Scan parallelism follows file splits; the driver's tables are single
    row-group parquet files, so a plain read plans ONE task no matter how
    many cores exist.  For CPU-bound transforms over narrow inputs
    (shingling, hashing, vector math) the input bytes are tiny but the
    per-row compute dominates — an explicit round-robin exchange decouples
    compute parallelism from input layout.  The task count scales with
    the plan's sizeInBytes statistic (metadata only, no job): tiny frames
    don't pay per-task scheduler overhead, big frames saturate the
    executors.  At 100 TB the inputs are many-file datasets, the byte
    statistic caps at defaultParallelism, and the same call is a cheap
    rebalance (or a no-op to remove); correctness never depends on
    partitioning.
    """
    if parallelism is None:
        default = df.sparkSession.sparkContext.defaultParallelism
        parallelism = default
        try:
            size = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            )
            by_size = max(1, size // SPREAD_BYTES_PER_TASK)
            parallelism = max(min(default, 8), min(default, by_size))
        except Exception:
            pass  # statistics unavailable → keep the executor-count default
    return df.repartition(parallelism)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver table into a dict."""
    return {name: load_table(spark, sf_dir, name) for name in TEST_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for ``spark.sql`` use."""
    for name in TEST_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
