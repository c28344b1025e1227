"""Misra-Gries heavy hitters: the frequent-items sketch that completes
the engine's sketch trio (HLL cardinality, GK quantiles, MG frequency).

Why a sketch: an exact "top items by frequency" over 100 TB shuffles the
full distinct-key set; Misra-Gries keeps ≤ k counters PER PARTITION
(fixed memory, one pass, no shuffle) and guarantees every item with
global frequency > n/(k+1) appears among the per-partition candidates:
if freq(x)/n > 1/(k+1), then by averaging some partition p has
freq_p(x)/n_p ≥ freq(x)/n, and the partition-local summary retains any
item above its local n_p/(k+1) (Misra & Gries 1982; merge form per
Agarwal et al., PODS 2012).

The candidate set may contain false positives, so the engine pairs the
sketch with an exact verification pass over candidates only (a semi-join
— cost ∝ matches, not distinct keys).  The composed operator is
therefore EXACTLY the SQL ``HAVING count(*) > n/(k+1)`` — which is what
makes it oracle-checkable value-for-value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Per-partition Misra-Gries summaries; returns the DISTINCT union of
    surviving items — a superset of every item with global frequency
    > n/(k+1).

    Each Arrow batch is pre-aggregated with ``value_counts`` (vectorized)
    and merged into the ≤k-counter summary as weighted inserts; when the
    summary overflows, all counters drop by the (k+1)-th largest value
    (the weighted MG step).  State is k counters per partition — fixed
    memory at any scale."""

    out_schema = f"{col} string"

    def mg(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = pdf[col].value_counts()
            for v, c in vc.items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {v: c - m for v, c in counters.items() if c - m > 0}
        yield pd.DataFrame({col: list(counters.keys())})

    cand = df.select(F.col(col).cast("string").alias(col)).mapInPandas(mg, out_schema)
    return cand.distinct()


def heavy_hitters_verified(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Exact heavy hitters (frequency > n/(k+1)) computed sketch-first:
    MG candidates → semi-join → exact count → threshold against the
    1-row total.  Aggregation state is bounded by the candidate set
    (≤ k × partitions items), never the full distinct-key domain."""
    cand = misra_gries_candidates(df, col, k)
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    counted = (
        df.select(F.col(col).cast("string").alias(col))
        .join(cand, col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counted.join(F.broadcast(total), F.col("n") > F.col("_n") / (k + 1))
        .select(col, "n")
    )
