"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in ``depositaja_spark/`` (see SURVEY.md §2
for the operator inventory); this module only adapts it to the driver's
interface via the query registry (``depositaja_spark/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_confs(spark: SparkSession) -> None:
    """Settings our plans rely on, applied to a driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet stores TIMESTAMP(NANOS) which Spark's reader rejects;
    # sources/tables.py reads it as long nanos and converts explicitly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the whole reference
    pipeline (validate → balance → windowed detector → flag fold → check
    join) as one Catalyst-planned job returning
    (wallet_id, balance, above_threshold) for every wallet."""
    _ensure_confs(spark)
    from depositaja_spark.plans import check_pipeline
    from depositaja_spark.sources import deposits_from_events, load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    return check_pipeline(deposits_from_events(events))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-pipeline extensions), each ``(spark, sf_dir) -> DataFrame``."""
    from depositaja_spark import registry

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            # Contract: fully materialize each returned DataFrame before
            # calling the next query (the driver does).  The sweep below
            # releases the PREVIOUS query's operator-internal caches —
            # tracked_persist frames and registry-tracked localCheckpoint
            # blocks (dedup shingles, pagerank rounds, IVF assignments) —
            # which are dead weight once materialized; without it a
            # 160-query sweep on the driver's default-sized heap
            # accumulates storage until it OOMs.  The sweep is restricted
            # to REGISTRY-TRACKED state on purpose: a blanket
            # unpersist-everything would also drop localCheckpoint blocks
            # that back a still-held prior result, whose truncated lineage
            # makes the loss unrecoverable for any caller that lazily
            # re-consumes it.  (Our iterative operators register their
            # final-round checkpoint blocks via track_pinned_rdds, so
            # release_caches() already retires everything we pin.)
            from depositaja_spark.functions.cache import release_caches

            release_caches()
            try:
                # broadcast variables from auto-broadcast joins are
                # reclaimed by ContextCleaner only after a driver GC
                # notices the weak refs — nudge it so a long sweep on a
                # small heap doesn't carry hundreds of stale broadcasts
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass  # py4j internals shifted — GC nudge is best-effort
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in registry.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalent for each query (same column names;
    doubles rounded identically on both sides)."""
    from depositaja_spark import registry

    return dict(registry.ORACLES)
