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


# --- fixed-point fast path ----------------------------------------------------
#
# DECIMAL(18,2) values stay compact (long-backed), but their PRODUCTS
# promote to DECIMAL(37,4)+ and every row then pays a Java BigDecimal
# multiply — the dominant cost of the TPC-H revenue aggregates (measured
# ~2× the whole query at sf0.1).  For 2-decimal inputs the same exact
# arithmetic fits scaled longs: price·100 and discount·100 are integers,
# so price·(1−discount) ≡ p100·(100−d100) in 1e-4 currency units — one
# codegen'd long multiply per row.  Only the SUM returns to decimal:
# accumulating in DECIMAL(38,0) keeps Spark's compact-long fast path
# until ~1e18 and promotes (checked, exact) beyond — so a group of ANY
# size is overflow-safe, unlike a raw long sum which would wrap at
# ~5·10⁷ rows·max-charge.  Results are bit-identical to the decimal
# formulation: both compute the same rational, and decimal→double casts
# round correctly in Spark and DuckDB alike.

#: scale of revenue_units4 values: 1e-4 currency units
REV_SCALE_4 = 10_000


def scaled_long(col: str, digits: int = 2) -> Column:
    """A d-decimal double measure as an exact scaled long (col·10^d)."""
    return F.expr(f"CAST(round({col} * {10 ** digits}) AS BIGINT)")


def revenue_units4(
    price_col: str = "l_extendedprice", disc_col: str = "l_discount"
) -> Column:
    """price·(1−discount) as an exact scaled long in 1e-4 units."""
    return F.expr(
        f"CAST(round({price_col} * 100) AS BIGINT)"
        f" * (100 - CAST(round({disc_col} * 100) AS BIGINT))"
    )


def exact_sum_scaled(expr: Column, scale: int = REV_SCALE_4) -> Column:
    """Exact, overflow-safe sum of a scaled-long measure, surfaced in
    currency units as a double (see the fixed-point note above)."""
    return (F.sum(expr.cast("decimal(38,0)")) / F.lit(scale)).cast("double")
