"""File-format source/sink surface beyond parquet.

The reference's only I/O is Kafka+protobuf; an engine replacing it at
100 TB needs the standard lake formats.  All readers take EXPLICIT schemas
(inference is a full extra pass over the data — never acceptable at scale)
and all writers demonstrate layout control (partition columns, target file
sizing via repartition) — the two knobs that decide scan cost later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC embeds its schema; like parquet it supports pushdown + pruning
    return spark.read.orc(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Write with explicit layout: ``partition_by`` creates the directory
    partitioning that later enables partition PRUNING (a date/tenant
    filter skips whole directories), ``target_files`` coalesces to avoid
    the small-files problem that kills listing/scan performance at scale."""
    out = df
    if target_files is not None:
        out = df.repartition(target_files, *(partition_by or []))
    writer = out.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def compact(spark: SparkSession, path: str, target_files: int) -> int:
    """Small-file compaction: rewrite a parquet table at ``path`` into
    ``target_files`` files; returns the new file count.

    Small files are the silent scan killer at 100 TB (per-file open cost,
    tiny row groups, starved vectorized readers); streaming sinks and
    over-parallel writes produce them constantly.  The rewrite is one
    ``repartition(target_files)`` — a round-robin shuffle that also
    rebalances skewed file sizes — staged through a temp dir and swapped
    in atomically-enough for a maintenance window (a table format —
    Delta/Iceberg — makes the swap transactional; this is the
    plain-parquet maintenance job)."""
    import os
    import shutil

    tmp = path.rstrip("/") + "__compact_tmp"
    spark.read.parquet(path).repartition(target_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return sum(
        1 for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
    )
