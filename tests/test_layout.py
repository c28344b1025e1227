"""Compaction layout maintenance: contents identical, parallelism real."""

from __future__ import annotations

from pyspark.sql import functions as F

from depositaja_spark.functions.layout import compact_table, scan_parallelism

SRC = "/root/testdata/sf0.001/lineitem.parquet"


def test_compaction_preserves_contents_and_raises_parallelism(spark, tmp_path):
    dest = str(tmp_path / "li_opt")
    before = scan_parallelism(spark, SRC)
    out = compact_table(spark, SRC, dest, n_files=8)
    after = scan_parallelism(spark, dest)

    assert after["files"] == 8
    assert after["row_groups"] >= 8
    # row groups bound the usable parallelism: the source's 1 row group
    # caps it at 1 busy task however many splits Spark hands out; the
    # compacted layout genuinely parallelizes (Spark may still bin-pack
    # tiny files into fewer partitions via openCostInBytes, so compare
    # against the row-group bound, not the file count)
    assert before["row_groups"] == 1
    assert after["read_partitions"] > 1
    assert after["read_partitions"] <= after["row_groups"] * 2

    # contents bit-identical (order-insensitive): same count, same
    # per-key exact sums over every measure
    src_df = spark.read.parquet(SRC)
    assert out.count() == src_df.count()
    agg = lambda df: sorted(
        tuple(r)
        for r in df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")),
            F.sum(F.hash("l_orderkey", "l_linenumber").cast("long")),
        )
        .collect()
    )
    assert agg(out) == agg(src_df)


def test_compaction_rejects_nonpositive(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        compact_table(spark, SRC, str(tmp_path / "x"), n_files=0)
