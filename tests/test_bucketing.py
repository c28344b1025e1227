"""Bucketed co-located join: the shuffle-elimination tool SCALING.md
prescribes for repeated large-large joins (lineitem⋈orders)."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from depositaja_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Both fact tables bucketed on the order key → the join plan has no
    shuffle Exchange on either side."""
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketdemo")
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .saveAsTable("bucketdemo.lineitem_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("bucketdemo.orders_b")
    )
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bucketdemo.lineitem_b").join(
            spark.table("bucketdemo.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and it still answers correctly
        assert j.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bucketdemo.lineitem_b")
        spark.sql("DROP TABLE IF EXISTS bucketdemo.orders_b")
