"""Planted-input tests for the retail fulfillment / pricing / constraint
audit tier (ship latency percentiles, discount profile, order-size
histogram, dbt-style DQ checks).  The oracle differential checks these
on the fixtures; here the inputs are hand-built to pin the median
convention, the exact decimals, and each DQ rule's trigger."""

from __future__ import annotations

from pyspark.sql import functions as F

from depositaja_spark import registry


def _write_retail(spark, tmp_path, orders, lines):
    """orders: (o_orderkey, o_custkey, status, totalprice, odate_day,
    priority); lines: (l_orderkey, partkey, suppkey, linenumber, qty,
    extprice, discount, tax, returnflag, linestatus, shipdate_day)."""
    spark.createDataFrame(
        [(ok, ck, st, tp, od * 86400, pr) for ok, ck, st, tp, od, pr in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, _od long, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_seconds("_od").alias("o_orderdate"), "o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [
            (ok, pk, sk, ln, q, ep, d, t, rf, ls, sd * 86400)
            for ok, pk, sk, ln, q, ep, d, t, rf, ls, sd in lines
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, _sd long",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", F.timestamp_seconds("_sd").alias("l_shipdate"),
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    return str(tmp_path)


def _line(ok, sd, qty=1.0, ep=100.0, d=0.0, t=0.0):
    return (ok, 1, 1, 1, qty, ep, d, t, "N", "O", sd)


def test_ship_latency_exact_median(spark, tmp_path):
    """One priority, latencies 1,2,2,9: median is the smallest latency
    whose cumulative reaches half (2·cum ≥ n → 2), mean 3.5."""
    orders = [(i, 1, "O", 1.0, 10, "1-URGENT") for i in range(1, 5)]
    lines = [_line(1, 11), _line(2, 12), _line(3, 12), _line(4, 19)]
    d = _write_retail(spark, tmp_path, orders, lines)
    (got,) = registry.QUERIES["ship_latency_by_priority"](spark, d).collect()
    assert (got.n_lines, got.min_days, got.max_days) == (4, 1, 9)
    assert got.mean_days == 3.5
    assert got.p50_days == 2


def test_discount_profile_exact_decimals(spark, tmp_path):
    """Two discount levels: revenue stays exact through the (1−d)
    multiply — 100·0.95 = 95.00 exactly, never a binary-float artifact."""
    orders = [(1, 1, "O", 1.0, 10, "1-URGENT")]
    lines = [
        _line(1, 11, qty=10.0, ep=100.0, d=0.05),
        _line(1, 11, qty=20.0, ep=100.0, d=0.05),
        _line(1, 11, qty=30.0, ep=50.0, d=0.0),
    ]
    d = _write_retail(spark, tmp_path, orders, lines)
    got = {
        r.discount: (r.n_lines, r.avg_quantity, r.discounted_revenue)
        for r in registry.QUERIES["discount_effect_profile"](spark, d).collect()
    }
    assert got[0.05] == (2, 15.0, 190.0)
    assert got[0.0] == (1, 30.0, 50.0)


def test_order_size_histogram_planted(spark, tmp_path):
    orders = [(i, 1, "O", 1.0, 10, "1-URGENT") for i in range(1, 4)]
    lines = [_line(1, 11), _line(2, 11), _line(2, 11), _line(3, 11),
             _line(3, 11), _line(3, 11)]
    d = _write_retail(spark, tmp_path, orders, lines)
    got = {
        r.order_size: r.n_orders
        for r in registry.QUERIES["order_size_histogram"](spark, d).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


def test_dq_checks_each_rule_fires_once(spark, tmp_path):
    """Six planted rows, each violating exactly one rule (the orphan row
    violates only FK existence; its NULL-vs-order comparison must not
    double-count the causality rule)."""
    orders = [(i, 1, "O", 1.0, 10, "1-URGENT") for i in range(1, 7)]
    lines = [
        _line(1, 11, qty=-5.0),          # quantity_positive
        _line(2, 11, d=0.5),             # discount_in_range
        _line(3, 11, t=0.2),             # tax_in_range
        _line(4, 11, ep=0.0),            # price_positive
        _line(5, 9),                     # ship (day 9) before order (day 10)
        _line(99, 11),                   # orphan: no order 99
        _line(6, 11),                    # clean row
    ]
    d = _write_retail(spark, tmp_path, orders, lines)
    got = {
        r.rule: (r.n_rows, r.n_violations)
        for r in registry.QUERIES["lineitem_dq_checks"](spark, d).collect()
    }
    assert all(n == 7 for n, _ in got.values())
    assert {k: v for k, (_, v) in got.items()} == {
        "quantity_positive": 1,
        "discount_in_range": 1,
        "tax_in_range": 1,
        "price_positive": 1,
        "ship_after_order": 1,
        "order_fk_exists": 1,
    }
