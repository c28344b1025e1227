"""2D skyline: parity with the quadratic dominance definition, tie
semantics, and the two-phase survivor property."""

from __future__ import annotations

import random

from depositaja_spark.functions.skyline import skyline_2d


def _brute(rows):
    out = []
    for i, (_, x, y) in enumerate(rows):
        dominated = any(
            qx <= x and qy <= y and (qx < x or qy < y)
            for j, (_, qx, qy) in enumerate(rows)
            if j != i
        )
        if not dominated:
            out.append(rows[i])
    return sorted(out)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, x double, y double")
    return sorted(
        (r.id, r.x, r.y) for r in skyline_2d(df, "x", "y").collect()
    )


def test_skyline_matches_brute_force_random(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = [
            (i, float(rng.randint(0, 30)), float(rng.randint(0, 30)))
            for i in range(120)
        ]
        assert _run(spark, rows) == _brute(rows), seed


def test_skyline_anticorrelated_keeps_whole_frontier(spark):
    # y = 100 - x: every distinct point is on the frontier
    rows = [(i, float(i), float(100 - i)) for i in range(50)]
    assert _run(spark, rows) == sorted(rows)


def test_skyline_coordinate_ties_all_survive(spark):
    # two rows share the single best coordinate pair — NOT EXISTS keeps
    # both (neither strictly dominates the other), so must we
    rows = [(1, 1.0, 1.0), (2, 1.0, 1.0), (3, 2.0, 2.0), (4, 1.0, 5.0)]
    got = _run(spark, rows)
    assert got == [(1, 1.0, 1.0), (2, 1.0, 1.0)]


def test_skyline_equal_x_strict_y(spark):
    # same x, different y: the smaller y dominates
    rows = [(1, 1.0, 2.0), (2, 1.0, 3.0)]
    assert _run(spark, rows) == [(1, 1.0, 2.0)]


def test_skyline_survives_many_partitions(spark):
    # force many input partitions so the local pass actually runs
    # distributed and the global pass must resolve cross-partition
    # dominance
    rng = random.Random(9)
    rows = [
        (i, float(rng.randint(0, 1000)), float(rng.randint(0, 1000)))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double").repartition(16)
    got = sorted((r.id, r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    assert got == _brute(rows)


def test_skyline_null_coordinates_excluded_not_poisoning(spark):
    """Review-pass regression: a NULL/NaN coordinate used to reach the
    numpy kernel, where NaN poisons the running cummin and silently
    drops every lexicographically LATER valid frontier point.  NULL/NaN
    rows must be excluded up front and valid points kept."""
    rows = [(1, 1.0, None), (2, 2.0, 5.0), (3, float("nan"), 1.0), (4, 3.0, 4.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted((r.id, r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
    # among valid rows {(2.0,5.0), (3.0,4.0)}: neither dominates the other
    assert got == [(2, 2.0, 5.0), (4, 3.0, 4.0)]


def test_skyline_exact_when_partition_spans_arrow_batches(spark):
    """Review-pass regression: the FINAL pass must be exact per
    partition, not per Arrow batch — with a tiny maxRecordsPerBatch a
    partition's survivors span many batches, and a per-batch kernel
    would leak points whose dominator sits in a different batch."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        rng = random.Random(21)
        rows = [
            (i, float(rng.randint(0, 400)), float(rng.randint(0, 400)))
            for i in range(1200)
        ]
        df = spark.createDataFrame(rows, "id long, x double, y double").coalesce(2)
        got = sorted((r.id, r.x, r.y) for r in skyline_2d(df, "x", "y").collect())
        assert got == _brute(rows)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
