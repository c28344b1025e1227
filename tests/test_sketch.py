"""Accuracy and mergeability bounds for the sketch aggregates — the
assertions that stand in for an oracle on implementation-defined
estimates."""

from __future__ import annotations

from pyspark.sql import functions as F

from depositaja_spark import registry
from depositaja_spark.sources import load_table
from tests.conftest import SF_ORACLE


def test_cardinality_sketches_within_error(spark):
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    got = registry.QUERIES["sketch_distinct_users"](spark, SF_ORACLE).collect()
    for r in got:
        for est in (r.approx_users, r.hll_users):
            rel = abs(est - exact[r.event_type]) / exact[r.event_type]
            assert rel < 0.05, f"{r.event_type}: {est} vs {exact[r.event_type]}"


def test_quantile_sketch_within_error(spark):
    events = load_table(spark, SF_ORACLE, "events")
    exact = {
        r.event_type: r.qs
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("qs"))
        .collect()
    }
    got = registry.QUERIES["quantile_sketch_values"](spark, SF_ORACLE).collect()
    for r in got:
        for est, true in zip((r.p50, r.p95, r.p99), exact[r.event_type]):
            assert abs(est - true) / max(true, 1e-9) < 0.05


def test_hll_sketches_merge(spark):
    """Partial sketches union to the global sketch — the property that
    makes them shuffle-light at scale (combine per partition, merge once)."""
    events = load_table(spark, SF_ORACLE, "events")
    merged = (
        events.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    direct = (
        events.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()[0]
        .est
    )
    assert merged == direct


def test_stratified_sample_fractions_and_determinism(spark):
    from depositaja_spark import registry

    q = registry.QUERIES["stratified_sample"]
    a = q(spark, SF_ORACLE).groupBy("event_type").count().collect()
    b = q(spark, SF_ORACLE).groupBy("event_type").count().collect()
    assert {(r.event_type, r["count"]) for r in a} == {
        (r.event_type, r["count"]) for r in b
    }  # same seed + same input ⇒ identical sample
    got = {r.event_type: r["count"] for r in a}
    totals = {
        r.event_type: r["count"]
        for r in load_table(spark, SF_ORACLE, "events").groupBy("event_type").count().collect()
    }
    assert got["error"] == totals["error"]  # fraction 1.0 keeps everything
    assert "signup" not in got  # fraction 0.0 drops everything
    for etype, frac in (("purchase", 0.5), ("click", 0.1), ("view", 0.1)):
        rel = got[etype] / totals[etype]
        assert abs(rel - frac) < 0.05, f"{etype}: {rel} vs {frac}"


def test_quantile_sketch_regime_error_bound(spark):
    """The GK sketch's approximate regime (accuracy ≪ group size): rank
    error is bounded by N/accuracy.  The registry query runs in the
    exact regime (oracle-checked); this pins the degradation path the
    100 TB deployment would actually be in."""
    events = load_table(spark, SF_ORACLE, "events")
    acc = 50  # rank error ≤ N/50 = 2% of ranks
    got = {
        r.event_type: r.q
        for r in events.groupBy("event_type")
        .agg(F.percentile_approx("value", 0.5, acc).alias("q"))
        .collect()
    }
    for etype, est in got.items():
        vals = sorted(
            r.value for r in events.filter(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        import bisect

        rank = bisect.bisect_left(vals, est)
        assert abs(rank - 0.5 * n) <= n / acc + 1, (
            f"{etype}: median estimate at rank {rank}/{n} exceeds GK bound"
        )


def test_misra_gries_superset_guarantee_on_planted_skew(spark):
    """Every item with frequency > n/(k+1) must survive the
    per-partition MG summaries — tested on a planted skew (two heavy
    keys among uniform noise) spread adversarially across partitions."""
    import random

    from depositaja_spark.functions.heavyhitters import (
        heavy_hitters_verified,
        misra_gries_candidates,
    )

    rng = random.Random(7)
    rows = (
        [("hot_a",)] * 4000
        + [("hot_b",)] * 3000
        + [(f"noise_{rng.randrange(500)}",) for _ in range(3000)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string").repartition(8)
    k = 16
    cand = {r.k for r in misra_gries_candidates(df, "k", k).collect()}
    assert {"hot_a", "hot_b"} <= cand
    got = {r.k: r.n for r in heavy_hitters_verified(df, "k", k).collect()}
    # exact: the verified output equals the true > n/(k+1) set
    assert got == {"hot_a": 4000, "hot_b": 3000}


def test_misra_gries_counter_bound(spark):
    """The candidate set is bounded by k x partitions regardless of the
    distinct-key count (the fixed-memory claim)."""
    from depositaja_spark.functions.heavyhitters import misra_gries_candidates

    df = (
        spark.range(20000)
        .selectExpr("CAST(id AS STRING) AS k")
        .repartition(4)
    )
    k = 8
    n_cand = misra_gries_candidates(df, "k", k).count()
    assert n_cand <= k * 4


def test_misra_gries_null_heavy_group_reported(spark):
    """NULL is a countable group: when NULL itself is a heavy hitter the
    sketch must nominate it and the exact-verify layer must count it
    (value_counts(dropna=False) + null-safe semi join) — matching the
    SQL oracle's GROUP BY, which reports a NULL group."""
    from depositaja_spark.functions.heavyhitters import heavy_hitters_verified

    rows = [(None,)] * 60 + [("a",)] * 25 + [("b",)] * 10 + [(f"t{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "k string").repartition(4)
    k = 4
    got = {r.k: r.n for r in heavy_hitters_verified(df, "k", k).collect()}
    n = len(rows)
    assert None in got and got[None] == 60
    assert got.get("a") == 25
    # exactness: output is exactly the > n/(k+1) set
    assert set(got) == {v for v, c in {None: 60, "a": 25, "b": 10}.items() if c > n / (k + 1)}


def test_bootstrap_ci_brackets_true_mean(spark):
    """Poisson-bootstrap 95% CI: for every event type the TRUE mean must
    fall inside [ci_lo, ci_hi] (thousands of rows per type → the CI is
    tight and well-centered), the bounds must be ordered, and the whole
    query is deterministic (hash-driven resampling, no RNG state)."""
    from pyspark.sql import functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    truth = {
        r.event_type: r.m
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.avg("value").alias("m"))
        .collect()
    }
    rows = {r.event_type: r for r in QUERIES["bootstrap_value_ci"](spark, sf).collect()}
    assert set(rows) == set(truth)
    for t, r in rows.items():
        assert r.ci_lo <= r.boot_median <= r.ci_hi, t
        assert r.ci_lo <= truth[t] <= r.ci_hi, (t, truth[t], r)
        # the interval is a real interval, not collapsed
        assert r.ci_hi - r.ci_lo > 0, t
    again = {r.event_type: r for r in QUERIES["bootstrap_value_ci"](spark, sf).collect()}
    assert {t: (r.ci_lo, r.boot_median, r.ci_hi) for t, r in rows.items()} == {
        t: (r.ci_lo, r.boot_median, r.ci_hi) for t, r in again.items()
    }


def test_hll_union_estimate_bound_beyond_exact_regime(spark):
    """The overlap query's union sketches outside the exact regime:
    two 60k-key sets with a known 20k overlap — union and
    inclusion-exclusion intersection estimates must land within the
    HLL error envelope (lgK=12 → ~1.6% rsd; intersection amplifies to
    the sum of the absolute errors, bounded generously)."""
    from pyspark.sql import functions as F

    a = spark.range(0, 60_000).select(F.lit("a").alias("t"), F.col("id"))
    b = spark.range(40_000, 100_000).select(F.lit("b").alias("t"), F.col("id"))
    sk = a.unionByName(b).groupBy("t").agg(F.hll_sketch_agg("id").alias("sk"),
                                           F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("n"))
    row = (
        sk.filter(F.col("t") == "a").select(F.col("sk").alias("ska"), F.col("n").alias("na"))
        .crossJoin(sk.filter(F.col("t") == "b").select(F.col("sk").alias("skb"), F.col("n").alias("nb")))
        .select("na", "nb",
                F.hll_sketch_estimate(F.hll_union("ska", "skb")).alias("u"))
        .collect()[0]
    )
    assert abs(row.na - 60_000) / 60_000 < 0.05
    assert abs(row.u - 100_000) / 100_000 < 0.05
    inter = row.na + row.nb - row.u
    assert abs(inter - 20_000) < 0.05 * 100_000


def test_hll_overlap_query_internally_consistent(spark):
    """Every pair row: intersect = a + b − union, 0 ≤ intersect ≤
    min(a, b), and jaccard = intersect / union."""
    from depositaja_spark.registry import QUERIES

    rows = QUERIES["hll_event_type_overlap"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10  # 5 types choose 2
    for r in rows:
        assert r.users_intersect == r.users_a + r.users_b - r.users_union
        assert 0 <= r.users_intersect <= min(r.users_a, r.users_b)
        assert abs(r.jaccard - r.users_intersect / r.users_union) < 1e-12
