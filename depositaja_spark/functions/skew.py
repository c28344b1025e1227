"""Skew mitigation: salted two-phase aggregation.

At 100 TB a handful of hot keys (one viral wallet, one boilerplate
shingle) can pin a whole stage on one task.  AQE's skew-join splitting
covers joins; for AGGREGATIONS over hot keys the classic fix is salting:
shuffle on (key, salt) first so the hot key spreads over ``buckets``
tasks, then combine the partials per key.  Cost: one extra (tiny) shuffle
of pre-aggregated rows — worth it exactly when a key's row count ≫ the
average.  Only associative aggregates compose this way, which is also why
the engine's folds (sum, min, max_by) are all associative by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame, key: str, value: Column | str, out: str, buckets: int = 32
) -> DataFrame:
    """Two-phase skew-proof keyed sum: groupBy(key, salt) → groupBy(key).

    Equivalent to ``df.groupBy(key).agg(sum(value))`` for any input
    (asserted in tests); use when one key dominates the distribution.
    """
    v = F.col(value) if isinstance(value, str) else value
    salt = (F.rand(seed=0) * buckets).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.sum(v).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias(out))
