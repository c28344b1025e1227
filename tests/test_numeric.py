"""The fixed-point money path (functions/numeric.py): bit-identity with
the exact DECIMAL formulation on adversarial and random 2-decimal
inputs, and the overflow-safety rationale (DECIMAL(38,0) accumulation)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from depositaja_spark.functions.numeric import (
    dec,
    exact_sum,
    exact_sum_scaled,
    revenue_units4,
    scaled_long,
)

#: 2-decimal money strategy: the driver's columns are generated at 2
#: decimals; include negatives, zero, and magnitudes up to 10^7
_money = st.integers(min_value=-10**9, max_value=10**9).map(lambda c: c / 100)
_disc = st.integers(min_value=0, max_value=100).map(lambda c: c / 100)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_money, _disc), min_size=1, max_size=40))
def test_revenue_fixed_point_equals_decimal(spark, rows):
    df = spark.createDataFrame(rows, "l_extendedprice double, l_discount double")
    one = F.lit(1).cast("decimal(18,2)")
    dec_sum = df.agg(
        exact_sum(dec("l_extendedprice") * (one - dec("l_discount"))).alias("s")
    ).first().s
    fp_sum = df.agg(exact_sum_scaled(revenue_units4()).alias("s")).first().s
    assert fp_sum == dec_sum  # bit-identical doubles, not approx


@settings(max_examples=12, deadline=None)
@given(st.lists(_money, min_size=1, max_size=40))
def test_scaled_long_sum_equals_decimal_sum(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    dec_sum = df.agg(exact_sum(dec("x")).alias("s")).first().s
    fp_sum = df.agg(exact_sum_scaled(scaled_long("x"), 100).alias("s")).first().s
    assert fp_sum == dec_sum


def test_sum_survives_long_overflow_magnitude(spark):
    """The DECIMAL(38,0) accumulator is the overflow story: synthetic
    per-row products near the int64 ceiling must sum exactly (a raw long
    sum would wrap)."""
    big = 9_000_000_000_000_000_000  # ~0.98 * int64 max
    df = spark.range(0, 4).select(F.lit(big).cast("long").alias("v"))
    got = df.agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s")
    ).first().s
    assert int(got) == 4 * big  # 3.6e19 > int64 max: promoted, exact


def test_scaled_long_rounds_half_like_oracle(spark):
    """round() at the cents boundary must agree between the Spark
    expression and Python/DuckDB semantics for representative values
    (2-decimal doubles are exactly representable scaled by 100 only
    after round — e.g. 0.29*100 = 28.999...)."""
    vals = [0.29, 0.57, 1.13, 2.675, -0.29, 123456.78]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r.x: r.c for r in df.select("x", scaled_long("x").alias("c")).collect()}
    import duckdb

    want = {
        v: duckdb.sql(f"SELECT CAST(round({v!r} * 100) AS BIGINT)").fetchone()[0]
        for v in vals
    }
    assert got == want


def test_welch_ttest_matches_numpy_replay(spark):
    """purchase_click_ttest vs the closed-form Welch statistic computed
    directly in numpy over the same rows (sample variance, ddof=1, and
    Welch–Satterthwaite dof)."""
    import numpy as np

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_type", "value").collect()
    a = np.array([r.value for r in ev if r.event_type == "purchase" and r.value is not None])
    b = np.array([r.value for r in ev if r.event_type == "click" and r.value is not None])
    se1 = a.var(ddof=1) / len(a)
    se2 = b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(se1 + se2)
    dof = (se1 + se2) ** 2 / (se1**2 / (len(a) - 1) + se2**2 / (len(b) - 1))

    row = QUERIES["purchase_click_ttest"](spark, sf).collect()[0]
    assert row.n_purchase == len(a) and row.n_click == len(b)
    assert abs(row.mean_diff - (a.mean() - b.mean())) <= 2e-6
    assert abs(row.t_stat - t) <= 2e-6
    assert abs(row.dof - dof) <= 2e-4


def test_winsorized_stats_match_numpy(spark):
    """winsorized_value_stats ≡ numpy on the fixture: clip at the exact
    rank-(k+1)/(n−k) order statistics with k = n//20, then plain
    moments (ddof=1)."""
    import numpy as np

    from depositaja_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_type", "value")
    byt: dict = {}
    for r in ev.collect():
        byt.setdefault(r.event_type, []).append(r.value)
    got = {r.event_type: r for r in QUERIES["winsorized_value_stats"](spark, sf).collect()}
    assert set(got) == set(byt)
    for t, vals in byt.items():
        v = np.sort(np.array(vals))
        n = len(v)
        k = n // 20
        lo, hi = v[k], v[n - k - 1]
        w = np.clip(v, lo, hi)
        # the engine goes through exact 1e-2 scaled longs
        w = np.round(w * 100).astype("int64")
        mean = w.sum() / (100.0 * n)
        var = (w.astype("float64") ** 2).sum() / 10000.0
        var = (var - (w.sum() / 100.0) ** 2 / n) / (n - 1)
        std = (max(var, 0.0)) ** 0.5
        g = got[t]
        assert g.n_events == n and g.p05_value == lo and g.p95_value == hi, t
        assert abs(g.win_mean - mean) < 1e-9, t
        assert abs(g.win_std - std) < 1e-9, t


def test_winsorized_no_clip_when_tiny_group(spark):
    """n < 20 ⇒ k = 0 ⇒ clipping is the identity (lo/hi are the min/max)
    and the winsorized mean equals the plain mean of the rounded cents."""
    from depositaja_spark.registry import QUERIES
    import __spark_entry__  # conf guard

    rows = [(i, "x", float(v)) for i, v in enumerate([3.25, 1.5, 9.75, 2.0])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    df.createOrReplaceTempView("_tiny")  # not used by query; exercise function inline
    from depositaja_spark.functions.windows import grouped_ntile_cume

    ranked = grouped_ntile_cume(df, "event_type", "value", "event_id", 4, rank_col="vrank")
    assert {r.vrank for r in ranked.collect()} == {1, 2, 3, 4}


def test_ks_test_matches_scipy_style_replay(spark):
    """ks_test_value_dist ≡ the textbook two-sample D computed directly
    over the fixture (max CDF gap across pooled distinct values, exact
    Fraction arithmetic so the replay can't float-drift)."""
    from fractions import Fraction

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_type", "value").collect()
    from decimal import Decimal

    a = sorted(
        Decimal(str(r.value)).quantize(Decimal("0.01"))
        for r in ev
        if r.event_type == "purchase" and r.value is not None
    )
    b = sorted(
        Decimal(str(r.value)).quantize(Decimal("0.01"))
        for r in ev
        if r.event_type == "click" and r.value is not None
    )
    import bisect

    best, best_v = Fraction(0), None
    for v in sorted(set(a) | set(b)):
        d = abs(
            Fraction(bisect.bisect_right(a, v), len(a))
            - Fraction(bisect.bisect_right(b, v), len(b))
        )
        if d > best or (d == best and best_v is None):
            best, best_v = d, v
    row = QUERIES["ks_test_value_dist"](spark, sf).collect()[0]
    assert row.n_purchase == len(a) and row.n_click == len(b)
    assert row.d_stat == round(float(best), 6)
    assert row.at_value == float(best_v)
    crit = 1.358 * ((len(a) + len(b)) / (len(a) * len(b))) ** 0.5
    assert row.reject_95 == (float(best) > crit)


def test_ks_test_planted_shift_rejects(spark, tmp_path):
    """Two arms drawn from visibly different supports: D must be large
    and the α=0.05 decision must reject; identical arms must not."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    def write(rows, path):
        df = spark.createDataFrame(
            [(i, i * 60, 1, et, v, None) for i, (et, v) in enumerate(rows)],
            "event_id long, t long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            "event_id", F.timestamp_seconds("t").alias("ts"),
            "user_id", "event_type", "value", "props",
        )
        df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")
        return str(path)

    shifted = [("purchase", float(10 + i % 40)) for i in range(200)]
    shifted += [("click", float(200 + i % 40)) for i in range(200)]
    d = write(shifted, tmp_path / "shift")
    row = QUERIES["ks_test_value_dist"](spark, d).collect()[0]
    assert row.d_stat == 1.0 and bool(row.reject_95) is True

    same = [("purchase", float(i % 40)) for i in range(200)]
    same += [("click", float(i % 40)) for i in range(200)]
    d = write(same, tmp_path / "same")
    row = QUERIES["ks_test_value_dist"](spark, d).collect()[0]
    assert row.d_stat == 0.0 and bool(row.reject_95) is False

    empty = [("purchase", float(i)) for i in range(50)]
    d = write(empty, tmp_path / "empty")
    assert QUERIES["ks_test_value_dist"](spark, d).count() == 0


def test_chi2_independent_table_is_zero(spark, tmp_path):
    """Counts exactly proportional across hours (every type appears k·c
    times in hour c): expected == observed everywhere → chi2 = 0,
    Cramér's V = 0."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    rows, eid = [], 0
    for t_i, et in enumerate(["a", "b"]):
        k = t_i + 1  # type b is 2x type a, uniformly — still independent
        for hour in range(3):
            for _ in range(k * 4):
                rows.append((eid, hour * 3600 + eid % 60, 1, et, 1.0, None))
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    (r,) = QUERIES["chi2_type_hour_independence"](spark, str(tmp_path)).collect()
    assert r.n_events == 36 and r.n_types == 2 and r.n_hours == 3
    assert r.dof == 2 and r.chi2 == 0.0 and r.cramers_v == 0.0


def test_chi2_perfect_dependence_v_is_one(spark, tmp_path):
    """Each type confined to its own hour: Cramér's V = 1 (chi2 = n·min
    (R−1, C−1) at perfect association)."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    rows = []
    for eid in range(60):
        et = "a" if eid < 30 else "b"
        hour = 5 if et == "a" else 9
        rows.append((eid, hour * 3600 + eid, 1, et, 1.0, None))
    df = spark.createDataFrame(
        rows,
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    (r,) = QUERIES["chi2_type_hour_independence"](spark, str(tmp_path)).collect()
    assert r.cramers_v == 1.0 and r.chi2 == 60.0 and r.dof == 1


def test_chi2_python_replay_on_real_data(spark):
    """Engine ≡ a python replay that accumulates the chi2 terms in the
    SAME (event_type, hour) order the window does — bit-exact."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    ev = (
        load_table(spark, sf, "events")
        .select("event_type", ((F.col("ts").cast("long") % 86400) / 3600).cast("int").alias("h"))
        .collect()
    )
    cells: dict = {}
    for r in ev:
        cells[(r.event_type, r.h)] = cells.get((r.event_type, r.h), 0) + 1
    rmarg: dict = {}
    cmarg: dict = {}
    for (t, h), o in cells.items():
        rmarg[t] = rmarg.get(t, 0) + o
        cmarg[h] = cmarg.get(h, 0) + o
    n = sum(cells.values())
    chi2 = 0.0
    for t, h in sorted(cells):
        o = float(cells[(t, h)])
        e = float(rmarg[t]) * float(cmarg[h]) / float(n)
        chi2 += (o - e) * (o - e) / e
    v = (chi2 / (float(n) * float(min(len(rmarg), len(cmarg)) - 1))) ** 0.5
    (r,) = QUERIES["chi2_type_hour_independence"](spark, sf).collect()
    assert r.n_events == n
    assert r.chi2 == round(chi2, 6)
    assert r.cramers_v == round(v, 6)
    assert r.dof == (len(rmarg) - 1) * (len(cmarg) - 1)


def test_mwu_perfect_separation_auc_one(spark, tmp_path):
    """Every purchase value above every click value: AUC = 1, z > 0;
    the flipped arms give AUC = 0 by symmetry (U1 + U2 = n1·n2)."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    rows = [("purchase", float(100 + i)) for i in range(30)]
    rows += [("click", float(i)) for i in range(40)]
    df = spark.createDataFrame(
        [(i, i * 60, 1, et, v, None) for i, (et, v) in enumerate(rows)],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    (r,) = QUERIES["mannwhitney_value_dist"](spark, str(tmp_path)).collect()
    assert r.n_purchase == 30 and r.n_click == 40
    assert r.auc == 1.0 and r.u_stat == 30.0 * 40.0
    assert r.z_stat is not None and r.z_stat > 6


def test_mwu_all_ties_null_z_auc_half(spark, tmp_path):
    """Both arms a single shared value: Var(U) collapses to 0 via the
    tie correction → NULL z, but the midrank AUC is exactly 0.5."""
    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES

    rows = [("purchase", 7.0)] * 10 + [("click", 7.0)] * 15
    df = spark.createDataFrame(
        [(i, i * 60, 1, et, v, None) for i, (et, v) in enumerate(rows)],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    (r,) = QUERIES["mannwhitney_value_dist"](spark, str(tmp_path)).collect()
    assert r.auc == 0.5 and r.z_stat is None


def test_mwu_python_midrank_replay(spark):
    """Engine ≡ textbook midrank U / tie-corrected z on the fixture,
    and AUC ≡ the direct pairwise P(purchase > click) + ½P(=) count."""
    from decimal import Decimal
    from fractions import Fraction

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("event_type", "value").collect()
    a = [Decimal(str(r.value)).quantize(Decimal("0.01"))
         for r in ev if r.event_type == "purchase" and r.value is not None]
    b = [Decimal(str(r.value)).quantize(Decimal("0.01"))
         for r in ev if r.event_type == "click" and r.value is not None]
    pooled = sorted(a + b)
    # midranks per distinct value
    mid: dict = {}
    i = 0
    while i < len(pooled):
        j = i
        while j + 1 < len(pooled) and pooled[j + 1] == pooled[i]:
            j += 1
        mid[pooled[i]] = Fraction(i + j + 2, 2)  # 1-based average rank
        i = j + 1
    r1 = sum(mid[v] for v in a)
    n1, n2, n = len(a), len(b), len(a) + len(b)
    u1 = r1 - Fraction(n1 * (n1 + 1), 2)
    from collections import Counter

    tie3 = sum(t**3 - t for t in Counter(pooled).values())
    var = float(n1) * n2 / 12 * ((n + 1) - float(tie3) / (n * (n - 1)))
    # direct AUC cross-check
    wins = sum(1 for x in a for y in b if x > y)
    ties = sum(1 for x in a for y in b if x == y)
    (r,) = QUERIES["mannwhitney_value_dist"](spark, sf).collect()
    assert r.n_purchase == n1 and r.n_click == n2
    assert r.u_stat == round(float(u1), 2)
    assert r.auc == round(float(u1) / (n1 * n2), 6)
    assert abs(r.auc - (wins + 0.5 * ties) / (n1 * n2)) < 1e-6
    import math

    z = (float(u1) - n1 * n2 / 2) / math.sqrt(var)
    assert abs(r.z_stat - z) < 1e-5


def _write_user_events(spark, tmp_path, rows):
    """rows: (event_id, t_seconds, user_id, event_type, value)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(eid, t, uid, et, v, None) for eid, t, uid, et, v in rows],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id", F.timestamp_seconds("t").alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _md5_arm(uid):
    import hashlib

    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2


def test_ab_ztest_matches_hash_replay(spark, tmp_path):
    """Arms replayed with the same md5-prefix parity in python; counts,
    lift, and pooled z agree with the closed form."""
    import math

    from depositaja_spark.registry import QUERIES

    rows = []
    eid = 0
    for uid in range(40):
        rows.append((eid, 60 * eid, uid, "view", 1.0)); eid += 1
        # every user purchases, but only uid % 3 == 0 converts at the
        # high-value (>= 150) threshold the test reads
        rows.append((eid, 60 * eid, uid, "purchase", 5.0)); eid += 1
        if uid % 3 == 0:
            rows.append((eid, 60 * eid, uid, "purchase", 200.0)); eid += 1
    d = _write_user_events(spark, tmp_path, rows)
    (r,) = QUERIES["ab_conversion_ztest"](spark, d).collect()
    arms = {uid: _md5_arm(uid) for uid in range(40)}
    conv = {uid: uid % 3 == 0 for uid in range(40)}  # high-value purchasers
    n0 = sum(1 for u in arms if arms[u] == 0)
    n1 = 40 - n0
    c0 = sum(1 for u in arms if arms[u] == 0 and conv[u])
    c1 = sum(1 for u in arms if arms[u] == 1 and conv[u])
    assert (r.n_control, r.conv_control) == (n0, c0)
    assert (r.n_treatment, r.conv_treatment) == (n1, c1)
    p0, p1, pp = c0 / n0, c1 / n1, (c0 + c1) / 40
    assert r.lift == round(p1 - p0, 6)
    z = (p1 - p0) / math.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    assert abs(r.z_stat - z) < 1e-6


def test_ab_ztest_degenerate_pool_null_z(spark, tmp_path):
    """Every user converts: pooled p = 1 → NULL z, lift 0."""
    from depositaja_spark.registry import QUERIES

    rows = []
    for uid in range(20):
        rows.append((uid, 60 * uid, uid, "purchase", 500.0))
    d = _write_user_events(spark, tmp_path, rows)
    (r,) = QUERIES["ab_conversion_ztest"](spark, d).collect()
    assert r.z_stat is None and r.lift == 0.0
    assert r.conv_control == r.n_control and r.conv_treatment == r.n_treatment


def test_cuped_planted_linear_covariate(spark, tmp_path):
    """Post-period value exactly 2× the pre-period value per user:
    θ = 2 and the variance reduction is exactly 1 (ρ² = 1); a
    constant pre-period yields NULL θ."""
    from depositaja_spark.registry import QUERIES

    rows = []
    eid = 0
    for uid in range(10):
        pre = float(10 + uid)
        rows.append((eid, 1000 + uid, uid, "view", pre)); eid += 1          # pre period
        rows.append((eid, 1296000 + 1000 + uid, uid, "view", 2 * pre)); eid += 1  # post
    d = _write_user_events(spark, tmp_path, rows)
    (r,) = QUERIES["cuped_variance_reduction"](spark, d).collect()
    assert r.n_users == 10
    assert r.theta == 2.0 and r.variance_reduction == 1.0

    rows = []
    eid = 0
    for uid in range(10):
        rows.append((eid, 1000 + uid, uid, "view", 5.0)); eid += 1
        rows.append((eid, 1296000 + 1000 + uid, uid, "view", float(uid))); eid += 1
    d2 = tmp_path / "flatpre"
    d2.mkdir()
    d = _write_user_events(spark, d2, rows)
    (r,) = QUERIES["cuped_variance_reduction"](spark, d).collect()
    assert r.theta is None and r.variance_reduction is None


def test_cuped_python_moment_replay(spark):
    """Engine ≡ exact-Decimal moment replay on the real fixture, and the
    reduction equals ρ² of the per-user (pre, post) pairs."""
    from decimal import Decimal

    import pyspark.sql.functions as F

    from depositaja_spark.registry import QUERIES
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "user_id", "value")
        .collect()
    )
    mid = (min(r.t for r in rows) + max(r.t for r in rows)) // 2
    per_user: dict = {}
    for r in rows:
        x, y = per_user.get(r.user_id, (Decimal(0), Decimal(0)))
        v = Decimal(str(r.value)).quantize(Decimal("0.01"))
        if r.t < mid:
            x += v
        else:
            y += v
        per_user[r.user_id] = (x, y)
    n = len(per_user)
    sx = float(sum(x for x, _ in per_user.values()))
    sy = float(sum(y for _, y in per_user.values()))
    sxx = float(sum(x * x for x, _ in per_user.values()))
    syy = float(sum(y * y for _, y in per_user.values()))
    sxy = float(sum(x * y for x, y in per_user.values()))
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    (r,) = QUERIES["cuped_variance_reduction"](spark, sf).collect()
    assert r.n_users == n
    assert r.theta == round(cov_n / varx_n, 6)
    assert r.variance_reduction == round(cov_n / varx_n * cov_n / vary_n, 6)
    assert 0 <= r.variance_reduction <= 1
