"""Count-Min sketch guarantees (functions/countmin.py): one-sided error,
the N·e/w overshoot bound, cell-wise merge linearity, and exactness in
the collision-free regime the registered query runs in."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from depositaja_spark.functions.countmin import cms_build, cms_estimate, cms_merge

WIDTH_TINY = 16  # forced collisions
DEPTH = 5


@pytest.fixture(scope="module")
def skewed(spark):
    # key-0 x 600, key-1..20 x 20 each: n=1000
    heavy = spark.range(0, 600).select(F.lit("key-0").alias("k"))
    tail = spark.range(0, 400).select(
        F.concat(F.lit("key-"), (F.col("id") % 20 + 1)).alias("k")
    )
    return heavy.unionByName(tail)


def _true_counts(df):
    return {r.k: r.n for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}


def test_never_underestimates(spark, skewed):
    sketch = cms_build(skewed, "k", WIDTH_TINY, DEPTH)
    probes = skewed.select("k").distinct()
    est = {r.k: r.est_n for r in cms_estimate(probes, sketch, "k", WIDTH_TINY, DEPTH).collect()}
    true = _true_counts(skewed)
    for k, n in true.items():
        assert est[k] >= n, f"{k}: {est[k]} < {n}"


def test_overshoot_within_cm_bound(spark, skewed):
    n_total = skewed.count()
    sketch = cms_build(skewed, "k", WIDTH_TINY, DEPTH)
    probes = skewed.select("k").distinct()
    est = {r.k: r.est_n for r in cms_estimate(probes, sketch, "k", WIDTH_TINY, DEPTH).collect()}
    true = _true_counts(skewed)
    bound = math.e * n_total / WIDTH_TINY
    # w.p. 1-e^-5 per key; 21 keys -> allow one excursion, none expected
    violations = sum(1 for k in true if est[k] - true[k] > bound)
    assert violations <= 1


def test_merge_equals_whole(spark, skewed):
    # deterministic split of the same multiset (limit() would not be)
    a = spark.range(0, 300).select(F.lit("key-0").alias("k"))
    b = spark.range(0, 300).select(F.lit("key-0").alias("k")).unionByName(
        spark.range(0, 400).select(F.concat(F.lit("key-"), (F.col("id") % 20 + 1)).alias("k"))
    )
    merged = cms_merge(
        cms_build(a, "k", WIDTH_TINY, DEPTH), cms_build(b, "k", WIDTH_TINY, DEPTH)
    )
    whole = cms_build(skewed, "k", WIDTH_TINY, DEPTH)
    got = {(r.row, r.pos): r.cnt for r in merged.collect()}
    want = {(r.row, r.pos): r.cnt for r in whole.collect()}
    assert got == want


def test_exact_in_collision_free_regime(spark, skewed):
    sketch = cms_build(skewed, "k", 4096, DEPTH)
    probes = skewed.select("k").distinct()
    est = {r.k: r.est_n for r in cms_estimate(probes, sketch, "k", 4096, DEPTH).collect()}
    assert est == _true_counts(skewed)


def test_unseen_key_estimates_zero_or_collision(spark, skewed):
    sketch = cms_build(skewed, "k", 4096, DEPTH)
    probes = spark.createDataFrame([("never-seen",)], "k string")
    est = cms_estimate(probes, sketch, "k", 4096, DEPTH).first().est_n
    assert est == 0  # collision-free width: absent key reads a zero cell


def test_sketch_size_is_bounded(spark, skewed):
    cells = cms_build(skewed, "k", WIDTH_TINY, DEPTH).count()
    assert cells <= WIDTH_TINY * DEPTH


def test_null_probe_key_is_counted(spark):
    """Regression: hash64(NULL) is NULL, so NULL-key occurrences used to
    bank into unreachable (row, NULL) cells and estimate to 0 — an
    UNDERcount, the one error class CMS promises never to produce."""
    df = spark.createDataFrame([("a",), (None,), (None,)], "k string")
    sketch = cms_build(df, "k", 4096, DEPTH)
    probes = df.select("k").distinct()
    est = {r.k: r.est_n for r in cms_estimate(probes, sketch, "k", 4096, DEPTH).collect()}
    assert est[None] == 2
    assert est["a"] == 1
