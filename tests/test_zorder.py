"""Z-order layout guarantees (functions/zorder.py): Morton-key bit
math, and the actual data-skipping win measured from real parquet
footers — per-file min/max ranges of BOTH dimensions must shrink under
the z-sorted layout, where a single-column sort leaves the other
dimension's ranges at full width."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions.zorder import (
    interleave_bits,
    minmax_buckets,
    write_zordered,
    zorder_key,
)
from depositaja_spark.sources import load_table
from tests.conftest import SF_ORACLE

N_FILES = 8


def test_interleave_bits_known_values(spark):
    # x=0b11, y=0b01 at 2 bits -> z = x0 y0 x1 y1 = 1,1,1,0 -> 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], "x long, y long")
    got = df.select(interleave_bits([F.col("x"), F.col("y")], 2).alias("z")).first().z
    assert got == 0b0111
    # dimension order matters: swapping dims moves y to the even bits
    got_swapped = (
        df.select(interleave_bits([F.col("y"), F.col("x")], 2).alias("z")).first().z
    )
    assert got_swapped == 0b1011


def test_interleave_is_injective_on_buckets(spark):
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    n = (
        df.select(interleave_bits([F.col("x"), F.col("y")], 5).alias("z"))
        .distinct()
        .count()
    )
    assert n == 1024


def test_interleave_rejects_long_overflow(spark):
    with pytest.raises(ValueError):
        interleave_bits([F.lit(1), F.lit(2), F.lit(3)], 22)


def _file_ranges(path: str, col_a: str, col_b: str) -> list[tuple[int, int]]:
    """Per-file (max-min) widths of two columns, read from parquet
    row-group stats — exactly the information a min/max-skipping scan
    uses."""
    ranges = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo_a = lo_b = None
        hi_a = hi_b = None
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                c = row.column(ci)
                name = c.path_in_schema
                st = c.statistics
                if name == col_a:
                    lo_a = st.min if lo_a is None else min(lo_a, st.min)
                    hi_a = st.max if hi_a is None else max(hi_a, st.max)
                elif name == col_b:
                    lo_b = st.min if lo_b is None else min(lo_b, st.min)
                    hi_b = st.max if hi_b is None else max(hi_b, st.max)
        ranges.append(((hi_a - lo_a), (hi_b - lo_b)))
    return ranges


def test_zordered_layout_shrinks_both_dimensions(spark, tmp_path):
    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_orderdate").cast("long") / 86400).cast("long").alias("o_day"),
    )
    joined, dims = minmax_buckets(orders, ["o_custkey", "o_day"])

    zpath = str(tmp_path / "zorder")
    keyed = zorder_key(joined, dims).select("o_orderkey", "o_custkey", "o_day", "zval")
    (
        keyed.repartitionByRange(N_FILES, "zval")
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(zpath)
    )
    single = str(tmp_path / "bycust")
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(single)
    )

    glob_cust = orders.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("c"),
        (F.max("o_day") - F.min("o_day")).alias("d"),
    ).first()

    z_ranges = _file_ranges(zpath, "o_custkey", "o_day")
    s_ranges = _file_ranges(single, "o_custkey", "o_day")
    assert len(z_ranges) == N_FILES

    z_cust = sum(r[0] for r in z_ranges) / len(z_ranges)
    z_day = sum(r[1] for r in z_ranges) / len(z_ranges)
    s_day = sum(r[1] for r in s_ranges) / len(s_ranges)

    # single-column sort: each file spans (nearly) the full day range
    assert s_day > 0.9 * glob_cust.d
    # z-order: BOTH dimensions' per-file widths well under full width
    assert z_cust < 0.6 * glob_cust.c
    assert z_day < 0.6 * glob_cust.d


def test_zorder_key_column_appended_not_reordered(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    keyed = zorder_key(orders, [F.col("o_custkey") % 16, F.col("o_orderkey") % 16], 4)
    assert keyed.columns == orders.columns + ["zval"]
    assert keyed.count() == orders.count()


# --- Hilbert ------------------------------------------------------------------


def test_hilbert_engine_matches_python_reference(spark):
    """hilbert_key over the full 16x16 grid at bits=4 ≡ the pure-Python
    xy2d: a bijection onto 0..255 whose consecutive cells are
    Manhattan-adjacent — the locality property that distinguishes
    Hilbert from Morton."""
    import pyspark.sql.functions as F

    from depositaja_spark.functions.zorder import hilbert_key, hilbert_xy2d

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    got = {
        (r.x, r.y): r.hval
        for r in hilbert_key(grid, F.col("x"), F.col("y"), bits=4).collect()
    }
    want = {(x, y): hilbert_xy2d(4, x, y) for x in range(16) for y in range(16)}
    assert got == want
    assert sorted(got.values()) == list(range(256))
    inv = {d: xy for xy, d in got.items()}
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_shipped_bits_random_coords(spark):
    """At the shipped 16-bit width: engine ≡ python reference on
    deterministic pseudo-random coordinates spanning the full range,
    and keys stay within [0, 2^32)."""
    import pyspark.sql.functions as F

    from depositaja_spark.functions.zorder import (
        HILBERT_BITS,
        hilbert_key,
        hilbert_xy2d,
    )

    coords = [((i * 48271) % 65536, (i * 16807 + 13) % 65536) for i in range(500)]
    df = spark.createDataFrame(coords, "x long, y long")
    got = {
        (r.x, r.y): r.hval
        for r in hilbert_key(df, F.col("x"), F.col("y"), bits=HILBERT_BITS).collect()
    }
    for (x, y), d in got.items():
        assert d == hilbert_xy2d(HILBERT_BITS, x, y)
        assert 0 <= d < (1 << (2 * HILBERT_BITS))
