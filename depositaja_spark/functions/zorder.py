"""Z-order (Morton) multi-dimensional clustering keys for data-skipping
layouts.

The 100 TB problem: a table physically sorted on ONE column prunes scans
only for predicates on that column — a filter on any other dimension
reads every file.  Interleaving the bits of D bucketed dimensions into
one Morton key and range-partition-sorting by it bounds EVERY
dimension's min/max range within each file to ~range/2^(bits_sorted/D),
so parquet footer stats (and Spark's file-level min/max skipping) prune
multi-dimensional predicates without D separate copies of the data.
This is the clustering scheme behind Delta/Iceberg ``ZORDER BY`` /
``sort_order(z)``, built here from plain integer expressions.

Everything is deterministic closed-form bit math (shift/and/or — no RNG,
no sampling), entirely inside whole-stage codegen, so the key computation
is scan-local with zero shuffles; the layout write adds exactly the one
range-exchange any global sort needs.

Scale notes: the Morton key is a LongType (≤63 interleaved bits total);
``write_zordered`` uses ``repartitionByRange(zcol)`` — sampled range
boundaries, so skewed dimension buckets spread across files instead of
hot-spotting one task — then ``sortWithinPartitions`` for intra-file
runs.  At 1000 executors this is the standard one-shuffle layout job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default per-dimension bucket width in bits — 2 dims × 16 bits = a
#: 32-bit Morton key; 65k buckets/dimension is finer than any practical
#: file count, so file boundaries, not bucket width, limit skipping.
ZORDER_BITS = 16


def interleave_bits(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton key of D already-bucketed non-negative int columns: bit b
    of dimension d lands at position ``b*D + d`` (round-robin, LSB
    first).  D*bits must fit a signed long (≤63).  The expansion is a
    flat sum of ``((x >> b) & 1) << (b*D + d)`` terms — all disjoint
    bits, so ``+`` == ``|`` — which codegen folds into one projection.
    """
    ndims = len(cols)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a signed long")
    terms = []
    for d, c in enumerate(cols):
        x = c.cast("long")
        for b in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1).cast("long")), b * ndims + d)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def interleave_bits_sql(exprs: list[str], bits: int = ZORDER_BITS) -> str:
    """The identical Morton expansion as ANSI/DuckDB SQL over the given
    already-bucketed integer expressions — generated from the same loop
    so the oracle reproduces the Spark column bit-for-bit."""
    ndims = len(exprs)
    terms = []
    for d, e in enumerate(exprs):
        for b in range(bits):
            # every term fully parenthesized: SQL's `+` binds tighter
            # than `<<`, so a bare `x << p1 + y << p2` reassociates
            terms.append(f"(((({e}) >> {b}) & 1) << {b * ndims + d})")
    return "(" + " + ".join(terms) + ")"


def zorder_key(
    df: DataFrame, bucket_cols: list[Column], bits: int = ZORDER_BITS, out_col: str = "zval"
) -> DataFrame:
    """Append the Morton key column for the given bucketed dimensions."""
    return df.withColumn(out_col, interleave_bits(bucket_cols, bits))


def minmax_buckets(
    df: DataFrame, cols: list[Column | str], bits: int = ZORDER_BITS
) -> tuple[DataFrame, list[Column]]:
    """Normalize each dimension to the FULL 2^bits bucket range via its
    observed min/max — the step production ZORDER implementations apply
    before interleaving (Delta uses sampled range-partition ids for the
    same reason): raw values with unequal magnitudes put one dimension's
    bits above all of the other's, and the range sort then clusters on
    that dimension alone, leaving the other at full per-file width.

    Plan cost: one tiny all-column min/max aggregate (map-side combined,
    one 1-row result) cross-joined back — AQE broadcasts the single row;
    the scaling itself is scan-local arithmetic.  Returns ``(df_with_
    bounds, scaled_cols)`` ready for ``interleave_bits`` /
    ``write_zordered``."""
    named = [(F.col(c) if isinstance(c, str) else c).alias(f"_zd{i}") for i, c in enumerate(cols)]
    base = df.select("*", *named)
    aggs = []
    for i in range(len(named)):
        aggs += [F.min(f"_zd{i}").alias(f"_lo{i}"), F.max(f"_zd{i}").alias(f"_hi{i}")]
    bounds = base.agg(*aggs)
    joined = base.crossJoin(F.broadcast(bounds))
    top = (1 << bits) - 1
    scaled = [
        F.when(
            F.col(f"_hi{i}") > F.col(f"_lo{i}"),
            ((F.col(f"_zd{i}") - F.col(f"_lo{i}")).cast("double") * top
             / (F.col(f"_hi{i}") - F.col(f"_lo{i}")).cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(len(named))
    ]
    return joined, scaled


def write_zordered(
    df: DataFrame,
    path: str,
    bucket_cols: list[Column],
    *,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered by the Morton
    key of ``bucket_cols``: one range exchange on zval (sampled
    boundaries — skew-tolerant), an intra-partition sort, and the key
    itself dropped from the payload (it is derivable; layouts should not
    widen the schema)."""
    keyed = zorder_key(df, bucket_cols, bits)
    (
        keyed.repartitionByRange(n_files, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )


# --- Hilbert curve ------------------------------------------------------------

#: per-dimension bits for the 2-D Hilbert key (32-bit key).  Matches
#: ZORDER_BITS so the two layouts are directly comparable.
HILBERT_BITS = 16


def hilbert_key(
    df: DataFrame,
    xcol: Column,
    ycol: Column,
    bits: int = HILBERT_BITS,
    out_col: str = "hval",
) -> DataFrame:
    """Hilbert-curve index of two already-bucketed non-negative int
    columns — the locality-superior alternative to the Morton key
    (every consecutive pair of Hilbert cells is Manhattan-adjacent, so
    range-partitioned files get tighter per-dimension min/max bounds
    than Z-order's quadrant jumps; Wikipedia's xy2d, unrolled).

    Plan shape: one SELECT per level rewriting (x, y, d) — the nested
    CASEs reference the previous level's x AND y multiple times, which
    is exactly what stops CollapseProject from inlining them into an
    exponential single projection; the result is a LINEAR chain of
    ``bits`` narrow Projects inside one codegen stage.  Scan-local, no
    shuffle, no Python."""
    keep = list(df.columns)
    out = df.select(
        "*",
        xcol.cast("long").alias("_hx"),
        ycol.cast("long").alias("_hy"),
        F.lit(0).cast("long").alias("_hd"),
    )
    for k in reversed(range(bits)):
        s = 1 << k
        rx = F.shiftright(F.col("_hx"), k).bitwiseAND(F.lit(1).cast("long"))
        ry = F.shiftright(F.col("_hy"), k).bitwiseAND(F.lit(1).cast("long"))
        quad = (rx * 3).bitwiseXOR(ry)
        x2 = (
            F.when(ry == 1, F.col("_hx"))
            .when(rx == 1, F.lit(s - 1) - F.col("_hy"))
            .otherwise(F.col("_hy"))
        )
        y2 = (
            F.when(ry == 1, F.col("_hy"))
            .when(rx == 1, F.lit(s - 1) - F.col("_hx"))
            .otherwise(F.col("_hx"))
        )
        out = out.select(
            *keep,
            x2.cast("long").alias("_hx"),
            y2.cast("long").alias("_hy"),
            (F.col("_hd") + F.lit(s * s) * quad).alias("_hd"),
        )
    return out.select(*keep, F.col("_hd").alias(out_col))


def hilbert_key_sql(
    base_select: str, key_cols: str, x_expr: str, y_expr: str,
    bits: int = HILBERT_BITS, out_col: str = "hval",
) -> str:
    """The identical unrolled xy2d as chained CTEs (one per level —
    LINEAR SQL text, where a single expanded expression would be
    exponential), generated from the same loop as hilbert_key so the
    oracle reproduces the Spark column bit-for-bit.

    ``base_select`` must be a full SELECT producing ``key_cols`` plus
    the raw dimension inputs consumed by ``x_expr``/``y_expr``."""
    ctes = [
        f"h0 AS (SELECT {key_cols}, CAST({x_expr} AS BIGINT) AS x,"
        f" CAST({y_expr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d"
        f" FROM ({base_select}) hbase)"
    ]
    lvl = 0
    for k in reversed(range(bits)):
        s = 1 << k
        rx = f"((x >> {k}) & 1)"
        ry = f"((y >> {k}) & 1)"
        quad = f"xor({rx} * 3, {ry})"
        x2 = f"CASE WHEN {ry} = 1 THEN x WHEN {rx} = 1 THEN {s - 1} - y ELSE y END"
        y2 = f"CASE WHEN {ry} = 1 THEN y WHEN {rx} = 1 THEN {s - 1} - x ELSE x END"
        ctes.append(
            f"h{lvl + 1} AS (SELECT {key_cols}, CAST({x2} AS BIGINT) AS x,"
            f" CAST({y2} AS BIGINT) AS y,"
            f" d + {s * s} * {quad} AS d FROM h{lvl})"
        )
        lvl += 1
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {key_cols}, d AS {out_col} FROM h{lvl}"
    )


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Pure-Python reference (tests): Wikipedia's iterative xy2d."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d
