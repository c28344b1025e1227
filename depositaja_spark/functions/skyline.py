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
2. **Global pass, no single-partition stage** — survivors are
   range-partitioned on (x, y).  Range partitioning may SPLIT an
   equal-x run across a boundary, but the invariant that matters is
   lexicographic: every point q in an EARLIER partition is (x, y)
   lex-smaller than every point p in a later one, i.e. q.x < p.x, or
   q.x = p.x with q.y < p.y.  In either case q.y ≤ p.y implies q
   dominates p (coords are distinct post-``distinct()``, so q ≠ p and
   at least one strict inequality holds).  Cross-partition dominance
   therefore reduces to ONE number per partition — the running minimum
   y over all earlier partitions — computed from a ≤P-row
   per-partition summary and broadcast back.  The local kernel then re-runs per partition for
   intra-partition dominance.  Even the anti-correlated worst case
   (every point a survivor) never funnels through one task.

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


def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact skyline of ONE pandas frame (distinct, NaN-free coords)."""
    if len(pdf) == 0:
        return pdf
    x = pdf["x"].to_numpy()
    y = pdf["y"].to_numpy()
    order = np.lexsort((y, x))  # x asc, then y asc
    ys = y[order]
    # survivor iff y is strictly below the running min of all
    # lex-earlier ys (coords are distinct, so a lex-earlier point
    # with y <= mine dominates) — one vectorized cummin, no Python
    # per element
    cm = np.minimum.accumulate(ys)
    prev_min = np.concatenate(([np.inf], cm[:-1]))
    keep = ys < prev_min
    return pdf.iloc[order[keep]]


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-BATCH pruner for the local pass: dominance within one Arrow
    batch only.  Safe as a pruner (dropping a dominated point can never
    drop a global survivor) but NOT exact per partition — a partition
    larger than arrow.maxRecordsPerBatch spans several batches and
    cross-batch dominated points survive.  The final pass must use
    ``_partition_skyline``."""
    for pdf in batches:
        yield _kernel(pdf)


def _partition_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """EXACT skyline of one whole partition: concatenates every Arrow
    batch before the kernel, so partition size never silently changes
    the answer (the per-batch variant would leak cross-batch dominated
    points once a partition exceeds arrow.maxRecordsPerBatch)."""
    frames = [pdf for pdf in batches]
    if not frames:
        return
    yield _kernel(pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0])


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
    from pyspark.sql import Window as W

    from depositaja_spark.functions.cache import tracked_persist

    # NULL/NaN coordinates are excluded UP FRONT: inside the kernel a
    # NaN would poison np.minimum.accumulate (every later cummin becomes
    # NaN, every later comparison False) and silently drop VALID
    # frontier points — the exclusion must happen before numpy sees the
    # data, not by relying on NaN comparison semantics
    coords = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .filter(
            F.col("x").isNotNull()
            & F.col("y").isNotNull()
            & ~F.isnan(F.col("x").cast("double"))
            & ~F.isnan(F.col("y").cast("double"))
        )
        .distinct()
    )
    local = coords.mapInPandas(_local_skyline, coords.schema)
    # global pass: range-partition survivors on (x, y) — equal x values
    # co-locate, so earlier partitions hold strictly-smaller x only —
    # and persist so the per-partition summary and the filtered frame
    # see the SAME partition assignment (repartitionByRange samples its
    # boundaries; two separate materializations could disagree)
    ranged = tracked_persist(
        local.repartitionByRange(32, "x", "y").withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    # ≤P-row summary → running min y over all EARLIER partitions
    wp = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    prev_min = (
        ranged.groupBy("_pid")
        .agg(F.min("y").alias("_ymin"))
        .select("_pid", F.min("_ymin").over(wp).alias("_prev_min"))
    )
    # cross-partition dominance: a strictly-smaller-x partition's point
    # dominates iff its y ≤ mine; intra-partition dominance re-runs the
    # exact kernel on what's left — no single-partition stage anywhere
    survivors = (
        ranged.join(F.broadcast(prev_min), "_pid")
        .filter(F.col("_prev_min").isNull() | (F.col("y") < F.col("_prev_min")))
        .select("x", "y")
    )
    # final pass must be exact per PARTITION (not per Arrow batch)
    frontier = survivors.mapInPandas(_partition_skyline, coords.schema)
    return df.join(
        frontier.select(
            F.col("x").alias(x_col), F.col("y").alias(y_col)
        ),
        [x_col, y_col],
        "left_semi",
    )
