"""Table layout maintenance: compaction for scan parallelism.

A parquet scan parallelizes across ROW GROUPS, not byte ranges: Spark
may hand out byte-range splits, but only the split containing a row
group's start does any work.  A table written as one row group per file
(or as a few giant row groups) therefore serializes every scan onto one
task no matter how many cores the cluster has — the single-file,
single-row-group driver fixtures here hit exactly that floor, and the
production analog is the small-files / giant-row-group problem that
Delta/Iceberg `OPTIMIZE` compaction exists to fix (our Z-order writer,
``functions/zorder.py:write_zordered``, is the multi-dimensional variant
of the same maintenance job; the serving-table bucket writer keeps its
own layout healthy the same way).

``compact_table`` rewrites a table into ``n_files`` files (one row group
or more each), giving every subsequent scan ``≥ n_files``-way
parallelism.  Contents are bit-identical — only the physical layout
changes — and readers need no code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_table(
    spark: SparkSession, src: str, dest: str, n_files: int = 16
) -> DataFrame:
    """Rewrite the parquet table at ``src`` into ``n_files`` files at
    ``dest`` (round-robin repartition — row order is not semantic in a
    relational table) and return a DataFrame reading the new layout.

    One full read + write of the table; run it once per maintenance
    cycle, not per query.  For sort-clustered layouts use
    ``write_zordered`` instead — this is the plain parallelism fix."""
    if n_files <= 0:
        raise ValueError("n_files must be positive")
    spark.read.parquet(src).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dest)
    return spark.read.parquet(dest)


def scan_parallelism(spark: SparkSession, path: str) -> dict:
    """Layout diagnostics for a parquet table: file count, row-group
    count, and the partition count Spark's reader will actually use —
    the number that bounds scan-stage parallelism."""
    import pyarrow.parquet as pq
    import glob
    import os

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    row_groups = sum(pq.ParquetFile(f).num_row_groups for f in files)
    parts = spark.read.parquet(path).rdd.getNumPartitions()
    return {"files": len(files), "row_groups": row_groups, "read_partitions": parts}
