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
