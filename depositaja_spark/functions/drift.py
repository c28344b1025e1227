"""Shared PSI (Population Stability Index) math.

ONE home for the binning expression and the smoothing fold so the batch
query (``queries_curate.q_psi_value_drift``), its generated oracle SQL,
and the streaming monitor (``streaming/pipeline.streaming_psi_drift`` /
``psi_from_state``) can never drift apart — previously each carried its
own copy of the clamped fixed-width binning and the (n+a)/(t+a·bins)
smoothing.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

PSI_BINS = 10
PSI_SMOOTH = 0.5  # additive smoothing per bin cell


def psi_bin_col(
    value: Column, mn: Column, mx: Column, bins: int = PSI_BINS
) -> Column:
    """Clamped fixed-width bin index for ``value`` against the fitted
    [mn, mx] range: floor((v−mn)/(mx−mn)·bins) clamped to [0, bins−1];
    a degenerate range (mx ≤ mn) puts everything in bin 0.  The SQL
    twin is ``psi_bin_sql`` — same ops in the same order."""
    b = float(bins)
    return (
        F.when(
            mx > mn,
            F.least(
                F.greatest(
                    F.floor((value - mn) / (mx - mn) * b),
                    F.lit(0).cast("long"),
                ),
                F.lit(bins - 1).cast("long"),
            ),
        )
        .otherwise(0)
    )


def psi_bin_sql(value: str, mn: str, mx: str, bins: int = PSI_BINS) -> str:
    """DuckDB SQL for the identical clamped binning expression."""
    return (
        f"CASE WHEN {mx} > {mn} "
        f"THEN least(greatest(CAST(floor(({value} - {mn}) / ({mx} - {mn})"
        f" * {bins}) AS BIGINT), 0), {bins - 1}) ELSE 0 END"
    )


def psi_smoothed(p_counts: dict, q_counts: dict, bins: int = PSI_BINS,
                 a: float = PSI_SMOOTH) -> float:
    """PSI between two dense bin-count dicts {bin: n} with additive
    smoothing: every cell +a, each total +a·bins,
    PSI = Σ (p − q)·ln(p/q)."""
    tp = sum(p_counts.get(b, 0) for b in range(bins)) + a * bins
    tq = sum(q_counts.get(b, 0) for b in range(bins)) + a * bins
    psi = 0.0
    for b in range(bins):
        pp = (p_counts.get(b, 0) + a) / tp
        qq = (q_counts.get(b, 0) + a) / tq
        psi += (pp - qq) * math.log(pp / qq)
    return psi
