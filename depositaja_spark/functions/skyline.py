"""Distributed 2D skyline (Pareto frontier): the rows not dominated by
any other row under joint minimization of two measures.

q dominates p iff q.x ≤ p.x ∧ q.y ≤ p.y with strict inequality in at
least one coordinate.  The classic OLAP "best tradeoffs" operator
(cheapest-and-smallest part, fastest-and-cheapest supplier); the naive
formulation is a NOT EXISTS anti self-join — quadratic and cartesian —
which is exactly what the oracle runs and the engine must never.

Scale shape (textbook two-phase distributed skyline):

1. **Local pass** — distinct (x, y) coordinate pairs, then a per-
   partition numpy kernel inside ``mapInPandas``: lexicographic sort +
   running y-min eliminates every locally-dominated point in O(n log n)
   per partition with zero Python per row.  Dominance is transitive, so
   a point dominated by ANY point is dominated by some local survivor —
   dropping locally-dominated points never loses a global survivor.
2. **Global pass** — the survivor union is orders of magnitude smaller
   (for correlated data, ~the frontier itself); the same kernel runs
   once more on a single coalesced partition to resolve cross-partition
   dominance.  Anti-correlated worst cases keep more survivors; the
   two-phase shape is still the standard answer (SFS/MapReduce skyline).

Ties: duplicate coordinate pairs never dominate each other (no strict
coordinate), so the frontier is computed on DISTINCT coords and the
caller semi-joins rows back — both members of a tied skyline pair
survive, matching the NOT EXISTS semantics exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            yield pdf
            continue
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        order = np.lexsort((y, x))  # x asc, then y asc
        xs, ys = x[order], y[order]
        # survivor iff y is strictly below the running min of all
        # lex-earlier ys (coords are distinct, so a lex-earlier point
        # with y <= mine dominates) — one vectorized cummin, no Python
        # per element
        cm = np.minimum.accumulate(ys)
        prev_min = np.concatenate(([np.inf], cm[:-1]))
        keep = ys < prev_min
        yield pdf.iloc[order[keep]]


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Rows of ``df`` on the (minimize x, minimize y) Pareto frontier.

    Returns the input rows (all columns) whose coordinate pair is on the
    frontier — coordinate ties all survive.  Rows with a NULL coordinate
    are excluded (NULL sorts as NaN inside the kernel and never wins a
    dominance comparison, and the coordinate semi-join cannot match
    NULL) — dominance over missing values is undefined, so filter or
    impute upstream if those rows matter.  See the module docstring for
    the two-phase plan."""
    coords = df.select(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).distinct()
    local = coords.mapInPandas(_local_skyline, coords.schema)
    # global pass on the (small) survivor union — one partition
    frontier = local.coalesce(1).mapInPandas(_local_skyline, coords.schema)
    return df.join(
        frontier.select(
            F.col("x").alias(x_col), F.col("y").alias(y_col)
        ),
        [x_col, y_col],
        "left_semi",
    )
