"""Skew-safe running sums: the two-level bucket-offset pattern.

A running (prefix) sum over ``PARTITION BY P ORDER BY O`` is the core of
sequence packing and budget selection, but the naive window puts every
row of a partition into ONE task's sort.  With a low-cardinality P (a
``lang`` column over a web corpus: ~20 values, English ≈ half the rows)
the dominant partition lands on a single executor — correct at sf0.1,
dead at 100 TB.

The fix decomposes the prefix sum along a coarse, ORDER-ALIGNED bucket of
the leading order column::

    cum(row) = offset(P, bucket) + running_sum within (P, bucket)

where ``offset`` is the total of all earlier buckets of the same P —
computed on the AGGREGATED (P, bucket) frame, which is smaller than the
input by the bucket width.  The within-bucket window partitions by
(P, bucket), so no task ever sorts more than one bucket's rows.  The
result is row-for-row identical to the flat window because the global
order (P, O) equals (P, bucket(O), O) when ``bucket`` is monotone in O.

Bucket-width sizing at scale: the offsets frame has N/width rows, the
widest window task sorts ≤ width rows.  width ≈ 1e5 keeps both ends
comfortable up to ~1e12 input rows (1e7 offset rows ≈ hundreds of MB,
still an order of magnitude under a corpus shuffle); beyond that, apply
the same decomposition to the offsets frame recursively.  Local tests
use small widths so multi-bucket stitching is actually exercised.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: default order-aligned bucket width (rows per bucket) for the packing
#: queries.  Small enough that sf0.01 test data (500 docs) spans multiple
#: buckets, so the offset-stitching path is genuinely exercised; at
#: production scale this is the knob described in the module docstring.
PACK_BUCKET_WIDTH = 128


def bucketed_running_sum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    value_col: str,
    *,
    extra_order_cols: list[str] | None = None,
    bucket_width: int = PACK_BUCKET_WIDTH,
    out_col: str = "cum",
) -> DataFrame:
    """Running sum of ``value_col`` over ``PARTITION BY part_cols ORDER BY
    order_col, extra_order_cols`` — semantically identical to the flat
    window, physically bounded to ``bucket_width``-row sort tasks.

    ``order_col`` must be numeric (the bucket is ``floor(o / width)``,
    monotone in o); ``extra_order_cols`` are tie-breakers that sort
    WITHIN an order_col value (e.g. chunk_id within doc_id), so they
    never cross a bucket boundary and don't affect offset math.

    Returns ``df`` with ``out_col`` appended.  Adds two narrow shuffles
    (the (P, bucket) aggregation and the offsets join) in exchange for
    removing the single-task-per-P-value sort; the offsets join carries
    no forced broadcast hint — at test scale AQE broadcasts it, at scale
    it degrades gracefully to a skew-free shuffle join on (P, bucket).
    """
    extra = extra_order_cols or []
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width)).alias("_bkt")
    b = df.withColumn("_bkt", bucket)

    # level 1: per-(P, bucket) totals, cumulated over the bucket axis only —
    # the window partitions by P over the AGGREGATED frame (1 row per
    # bucket), so even the dominant P value holds N/width rows, not N.
    woff = (
        W.partitionBy(*part_cols)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    offsets = (
        b.groupBy(*part_cols, "_bkt")
        .agg(F.sum(value_col).alias("_bt"))
        .select(
            *part_cols,
            "_bkt",
            (F.sum("_bt").over(woff) - F.col("_bt")).alias("_off"),
        )
    )

    # level 2: bounded within-bucket running sum, stitched to the offset
    wrun = (
        W.partitionBy(*part_cols, "_bkt")
        .orderBy(order_col, *extra)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        b.join(offsets, [*part_cols, "_bkt"])
        .withColumn(out_col, F.col("_off") + F.sum(value_col).over(wrun))
        .drop("_bkt", "_off")
    )


def pack_ids(cum: Column, n_tokens: Column, target: int) -> Column:
    """Greedy streaming pack id from a running token total: the bin the
    row's FIRST token falls into at ``target`` tokens per bin."""
    return F.floor((cum - n_tokens) / target)


def distributed_ntile(
    df: DataFrame,
    metric_col: str,
    tiebreak_col: str,
    n_tiles: int,
    total: int,
    out_col: str,
    *,
    n_buckets: int = 64,
    accuracy: int = 10_000,
) -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (ORDER BY metric DESC, tiebreak ASC)``
    without the single-task global sort.

    The flat ntile window forces every row through ONE task's sort —
    fine on an aggregated frame at test scale, dead when that frame has
    10⁹ rows.  Decomposition (same offset idea as bucketed_running_sum,
    but bucketed by VALUE instead of a monotone key):

      1. ~n_buckets approximate quantile split points of the metric
         (GK sketch, driver-side, KB);
      2. scan-local coarse bucket per row — equal metric values always
         share a bucket, and the bucket index is monotone in the DESC
         order, so no tie ever straddles a boundary;
      3. exact bucket counts → cumulative offsets on the
         n_buckets-sized frame;
      4. within-bucket row_number (each window sorts ≈ N/n_buckets
         rows — plus tie mass: a value held by a large fraction of
         rows concentrates in one bucket, the documented worst case);
      5. global rank = offset + within-rank, and the tile follows from
         ntile's exact fill arithmetic on (rank, total, n_tiles).

    Result is row-identical to the flat window because the composed
    order (bucket, metric DESC, tiebreak) equals the flat order."""
    d = F.col(metric_col).cast("double")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(F.percentile_approx(d, fracs, accuracy).alias("q")).collect()[0]
    bounds = sorted(set(row.q or []))
    # ascending bucket = #bounds strictly below the value; descending
    # index flips it so bucket order matches the DESC rank order
    asc = sum(
        (F.when(d > F.lit(b), 1).otherwise(0) for b in bounds),
        F.lit(0),
    )
    nb = len(bounds)
    b = df.withColumn("_vb", (F.lit(nb) - asc).cast("int"))
    counts = b.groupBy("_vb").agg(F.count(F.lit(1)).alias("_bn"))
    woff = W.orderBy("_vb").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "_vb", F.coalesce(F.sum("_bn").over(woff), F.lit(0)).alias("_boff")
    )
    wrank = W.partitionBy("_vb").orderBy(d.desc(), F.asc(tiebreak_col))
    ranked = b.join(F.broadcast(offsets), "_vb").withColumn(
        "_rank", F.col("_boff") + F.row_number().over(wrank)
    )
    q, r = divmod(total, n_tiles)
    if q == 0:
        tile = F.col("_rank")
    else:
        head = (F.col("_rank") - 1) / (q + 1)
        tail = F.lit(r) + (F.col("_rank") - 1 - (q + 1) * r) / q
        tile = F.when(F.col("_rank") <= (q + 1) * r, F.floor(head) + 1).otherwise(
            F.floor(tail) + 1
        )
    return ranked.withColumn(out_col, tile.cast("int")).drop(
        "_vb", "_boff", "_rank"
    )


def grouped_ntile_cume(
    df: DataFrame,
    part_col: str,
    value_col: str,
    tiebreak_col: str,
    n_tiles: int,
    *,
    tile_col: str = "quartile",
    cume_col: str = "cdist",
    n_buckets: int = 64,
    accuracy: int = 10_000,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact per-group ``ntile(n) OVER (PARTITION BY part ORDER BY value,
    tiebreak)`` and ``cume_dist() OVER (PARTITION BY part ORDER BY
    value)`` without a per-group global sort.

    A low-cardinality partition column (5 market segments over a
    customer table that scales with sf) puts n/5 rows through one
    window task — the same hot-partition class as per-language packing.
    Decomposition: per-group approximate-quantile value buckets
    (broadcast bounds table; equal values always share a bucket, and
    the bucket is monotone in the value order, so ties never straddle a
    boundary), exact bucket counts cumulated on the groups×buckets
    frame, bounded within-bucket ranking, then

      rank      = bucket offset + within-bucket row_number
      ntile     = exact fill arithmetic on (rank, group total)
      cume_dist = (last rank among the row's value ties) / group total

    Row-identical to the flat windows; asserted against them in tests
    and against the DuckDB oracle.  ``rank_col`` optionally keeps the
    exact per-group rank itself (consumers like the Gini query need the
    rank, not just its tile)."""
    d = F.col(value_col).cast("double")
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.groupBy(part_col).agg(
        F.sort_array(F.array_distinct(F.percentile_approx(d, fracs, accuracy))).alias(
            "_bounds"
        )
    )
    b = (
        df.join(F.broadcast(bounds), part_col)
        .withColumn(
            "_vb",
            F.aggregate(
                "_bounds",
                F.lit(0),
                lambda acc, x: acc + F.when(d > x, 1).otherwise(0),
            ).cast("int"),
        )
        .drop("_bounds")
    )
    counts = b.groupBy(part_col, "_vb").agg(F.count(F.lit(1)).alias("_bn"))
    woff = (
        W.partitionBy(part_col).orderBy("_vb").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        part_col,
        "_vb",
        F.coalesce(F.sum("_bn").over(woff), F.lit(0)).alias("_boff"),
    )
    totals = counts.groupBy(part_col).agg(F.sum("_bn").alias("_n"))
    wrank = W.partitionBy(part_col, "_vb").orderBy(d.asc(), F.asc(tiebreak_col))
    ranked = (
        b.join(F.broadcast(offsets), [part_col, "_vb"])
        .join(F.broadcast(totals), part_col)
        .withColumn("_rank", F.col("_boff") + F.row_number().over(wrank))
    )
    # ties in value share the LAST tie's rank for cume_dist
    wtie = W.partitionBy(part_col, "_vb", value_col)
    ranked = ranked.withColumn("_rank_le", F.max("_rank").over(wtie))
    q = F.floor(F.col("_n") / n_tiles)
    r = F.col("_n") % n_tiles
    head = F.floor((F.col("_rank") - 1) / (q + 1)) + 1
    tail = r + F.floor((F.col("_rank") - 1 - (q + 1) * r) / q) + 1
    tile = F.when(q == F.lit(0), F.col("_rank")).otherwise(
        F.when(F.col("_rank") <= (q + 1) * r, head).otherwise(tail)
    )
    out = ranked.withColumn(tile_col, tile.cast("int")).withColumn(
        cume_col, F.round(F.col("_rank_le") / F.col("_n"), 6)
    )
    if rank_col is not None:
        out = out.withColumn(rank_col, F.col("_rank"))
    return out.drop("_vb", "_boff", "_n", "_rank", "_rank_le")
