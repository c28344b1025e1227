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


def mg_merge(counters: dict[str, int], items, k: int) -> dict[str, int]:
    """Weighted Misra-Gries merge: fold (value, count) pairs into a
    ≤k-counter summary.  On overflow every counter drops by the
    (k+1)-th largest value and non-positive counters are evicted —
    the mergeable-summaries form (Agarwal et al., PODS 2012), which
    preserves the superset guarantee across arbitrary merge trees
    (partitions, micro-batches, rounds)."""
    out = dict(counters)
    for v, c in items:
        out[v] = out.get(v, 0) + int(c)
    if len(out) > k:
        m = sorted(out.values(), reverse=True)[k]
        out = {v: c - m for v, c in out.items() if c - m > 0}
    return out


def misra_gries_summaries(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Per-partition Misra-Gries summaries as (col, cnt) rows — ≤k rows
    per partition, fixed memory at any scale.  Each Arrow batch is
    pre-aggregated with ``value_counts`` (vectorized) and folded in via
    ``mg_merge``."""

    out_schema = f"{col} string, cnt long"

    def mg(batches):
        counters: dict[str | None, int] = {}
        for pdf in batches:
            # dropna=False: NULL is a countable group (the exact-verify
            # layer and the SQL oracle's GROUP BY both report a NULL
            # group, so the sketch must be able to nominate it).  pandas
            # surfaces missing strings as NaN — normalize to None so the
            # counter key is stable across batches.
            items = (
                (None if pd.isna(v) else v, c)
                for v, c in pdf[col].value_counts(dropna=False).items()
            )
            counters = mg_merge(counters, items, k)
        yield pd.DataFrame(
            {col: list(counters.keys()), "cnt": list(counters.values())}
        )

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(mg, out_schema)


def misra_gries_candidates(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """DISTINCT union of the per-partition summary items — a superset of
    every item with global frequency > n/(k+1): if freq(x)/n > 1/(k+1),
    some partition has local relative frequency at least as large, and
    that partition's summary retains x."""
    return misra_gries_summaries(df, col, k).select(col).distinct()


def heavy_hitters_verified(df: DataFrame, col: str, k: int = 16) -> DataFrame:
    """Exact heavy hitters (frequency > n/(k+1)) computed sketch-first:
    MG candidates → semi-join → exact count → threshold against the
    1-row total.  Aggregation state is bounded by the candidate set
    (≤ k × partitions items), never the full distinct-key domain."""
    cand = misra_gries_candidates(df, col, k)
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    vals = df.select(F.col(col).cast("string").alias(col))
    counted = (
        # null-SAFE semi join: a NULL candidate must still select the
        # NULL rows for exact counting (plain equality drops them)
        vals.join(
            cand.withColumnRenamed(col, "_cand"),
            vals[col].eqNullSafe(F.col("_cand")),
            "left_semi",
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counted.join(F.broadcast(total), F.col("n") > F.col("_n") / (k + 1))
        .select(col, "n")
    )
