"""Deterministic money/measure aggregation.

Floating-point sums are summation-order dependent: a distributed sum over
N partitions accumulates O(sqrt(N)·ulp) noise, which differs run-to-run
(AQE can change partitioning) and engine-to-engine.  For 2-decimal money
columns the engine aggregates in DECIMAL — exact and order-independent —
and casts the final result to double (correctly-rounded in both Spark and
DuckDB, hence bit-identical).  This is also the right call at 100 TB:
decimal sums cost one extra long of state per group and remove a whole
class of nondeterminism from replays, retries, and speculative execution.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: str | Column, scale: str = MONEY) -> Column:
    """Cast a 2-decimal double measure to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(scale)


def exact_sum(expr: Column) -> Column:
    """Exact decimal sum surfaced as a double (bit-stable across engines
    and partitionings)."""
    return F.sum(expr).cast("double")


def exact_avg(expr: Column) -> Column:
    """Exact-sum-over-count average: both operands deterministic, so the
    double division is too."""
    return F.sum(expr).cast("double") / F.count(F.lit(1))
