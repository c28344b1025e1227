"""Behavioral tests for the round-8 time-series / audit analytics:
CUSUM closed form (≡ the textbook recursion), exact-moment ACF,
time-weighted average, and the Benford first-digit audit — golden and
planted-shift cases the oracle differential can't isolate."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from depositaja_spark.registry import QUERIES
from depositaja_spark.sources import load_table
from tests.conftest import SF_SMALL


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, t_seconds, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [(eid, t, uid, et, v, None) for eid, t, uid, et, v in rows],
        "event_id long, t long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds("t").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


# --- CUSUM --------------------------------------------------------------------


def _cusum_replay(spark):
    """Pure-Python replay of cusum_value_shift at SF_SMALL with the
    engine's exact op order (Decimal sums, one float division, forward
    float accumulation)."""
    ev = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "event_type", "value")
        .collect()
    )
    by_type: dict[str, dict[int, list[Decimal]]] = {}
    for r in ev:
        h = r.t - r.t % 3600
        by_type.setdefault(r.event_type, {}).setdefault(h, []).append(
            Decimal(str(r.value)).quantize(Decimal("0.01"))
        )
    out = {}
    for et, hours in by_type.items():
        total = sum(v for vs in hours.values() for v in vs)
        n_all = sum(len(vs) for vs in hours.values())
        mu = float(total) / n_all
        p, m, series = 0.0, 0.0, {}
        for h in sorted(hours):
            mean_h = float(sum(hours[h])) / len(hours[h])
            p += mean_h - 1.05 * mu
            m = min(m, p)  # min(0, running min) folded with the 0 seed
            series[h] = p - min(0.0, m)
        out[et] = series
    return out


def test_cusum_closed_form_matches_python_replay(spark):
    got = {
        (r.event_type, r.hour_unix): r.cusum
        for r in QUERIES["cusum_value_shift"](spark, SF_SMALL).collect()
    }
    want = _cusum_replay(spark)
    assert len(got) == sum(len(s) for s in want.values())
    for (et, h), v in got.items():
        assert v == want[et][h], (et, h, v, want[et][h])


def test_cusum_equals_textbook_recursion(spark):
    """S_t = max(0, S_{t-1} + z_t) ≡ P_t − min(0, min_{j≤t} P_j) —
    algebraically identical; float paths agree to relative 1e-9."""
    want = _cusum_replay(spark)
    ev = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "event_type", "value")
        .collect()
    )
    by_type: dict[str, dict[int, list[Decimal]]] = {}
    for r in ev:
        h = r.t - r.t % 3600
        by_type.setdefault(r.event_type, {}).setdefault(h, []).append(
            Decimal(str(r.value)).quantize(Decimal("0.01"))
        )
    for et, hours in by_type.items():
        total = sum(v for vs in hours.values() for v in vs)
        n_all = sum(len(vs) for vs in hours.values())
        mu = float(total) / n_all
        s = 0.0
        for h in sorted(hours):
            mean_h = float(sum(hours[h])) / len(hours[h])
            s = max(0.0, s + (mean_h - 1.05 * mu))
            assert math.isclose(s, want[et][h], rel_tol=1e-9, abs_tol=1e-9)


def test_cusum_planted_shift(spark, tmp_path):
    """Flat series then a +100% level shift: the statistic is exactly 0
    through the flat prefix and climbs monotonically after the shift."""
    rows = [(i, 3600 * i, 1, "a", 10.0) for i in range(20)] + [
        (i, 3600 * i, 1, "a", 20.0) for i in range(20, 30)
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.hour_unix // 3600: r.cusum
        for r in QUERIES["cusum_value_shift"](spark, d).collect()
    }
    assert len(got) == 30
    for h in range(20):
        assert got[h] == 0.0  # z < 0 throughout → statistic pinned at 0
    for h in range(21, 30):
        assert got[h] > got[h - 1]  # strictly climbing after the shift
    # mu = 400/30, offset = 1.05*mu ≈ 14: ten hours of z ≈ +6 ≈ 60
    assert math.isclose(got[29], 60.0, rel_tol=1e-9)


# --- ACF ----------------------------------------------------------------------


def test_acf_matches_numpy_definition(spark):
    """Engine ACF (exact-moment expansion) ≡ the direct numpy definition
    r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)² on the same hourly series."""
    import numpy as np

    hourly = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (F.col("ts").cast("long") - F.col("ts").cast("long") % 3600).alias(
                "h"
            ),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.h, float(r.x)))
    got = {
        r.event_type: r for r in QUERIES["hourly_value_acf"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(series)
    for et, pts in series.items():
        x = np.array([v for _, v in sorted(pts)])
        xbar = x.mean()
        den = ((x - xbar) ** 2).sum()
        assert got[et].n_hours == len(x)
        for k in (1, 2, 3):
            want = (
                float(((x[k:] - xbar) * (x[:-k] - xbar)).sum() / den)
                if len(x) > k and den != 0
                else None
            )
            have = got[et][f"acf_lag{k}"]
            if want is None:
                assert have is None
            else:
                # moment expansion vs direct deviations: identical value up
                # to benign cancellation noise in the comparison itself
                assert math.isclose(have, want, rel_tol=1e-6, abs_tol=1e-9)


def test_acf_alternating_and_constant(spark, tmp_path):
    """An alternating series anti-correlates at lag 1 and correlates at
    lag 2; a constant series has zero variance → NULL ACF at every lag."""
    rows = [
        (i, 3600 * i, 1, "alt", 10.0 if i % 2 == 0 else 20.0) for i in range(12)
    ] + [(100 + i, 3600 * i, 2, "flat", 7.0) for i in range(8)]
    d = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in QUERIES["hourly_value_acf"](spark, d).collect()}
    assert got["alt"].acf_lag1 < -0.8
    assert got["alt"].acf_lag2 > 0.7
    assert got["alt"].acf_lag3 < -0.6
    for k in (1, 2, 3):
        assert got["flat"][f"acf_lag{k}"] is None


# --- TWAP ---------------------------------------------------------------------


def test_twap_golden(spark, tmp_path):
    """Step-integral golden case + tie handling + degenerate users."""
    rows = [
        # user 1: 10 held 10s, 20 held 30s, 30 terminal → (100+600)/40
        (1, 0, 1, "a", 10.0),
        (2, 10, 1, "a", 20.0),
        (3, 40, 1, "a", 30.0),
        # user 2: single event → no covered span → dropped
        (4, 0, 2, "a", 99.0),
        # user 3: two same-second events → span 0 → dropped by HAVING
        (5, 0, 3, "a", 1.0),
        (6, 0, 3, "a", 2.0),
        # user 4: same-second tie resolved by event_id, zero weight on the
        # first; 7 then holds the full 100s
        (7, 0, 4, "a", 5.0),
        (8, 0, 4, "a", 7.0),
        (9, 100, 4, "a", 9.0),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in QUERIES["user_value_twap"](spark, d).collect()}
    assert set(got) == {1, 4}
    assert got[1].twap == 17.5 and got[1].span_seconds == 40
    assert got[4].twap == 7.0 and got[4].span_seconds == 100


def test_twap_unweighted_mean_disagrees(spark, tmp_path):
    """The row mean over-weights bursts; TWAP must not equal it on an
    irregular series (the operator's reason to exist)."""
    rows = [(1, 0, 1, "a", 10.0), (2, 1, 1, "a", 10.0), (3, 2, 1, "a", 10.0),
            (4, 3, 1, "a", 100.0), (5, 1000, 1, "a", 0.0)]
    d = _write_events(spark, tmp_path, rows)
    r = QUERIES["user_value_twap"](spark, d).collect()[0]
    # 10 held 3s, 100 held 997s → TWAP ≈ 99.73, row mean = 44
    assert r.twap > 99.0


# --- Benford ------------------------------------------------------------------


def test_benford_digits_match_python_replay(spark):
    prices = [
        r.o_totalprice
        for r in load_table(spark, SF_SMALL, "orders").select("o_totalprice").collect()
    ]
    counts: dict[int, int] = {}
    for p in prices:
        cents = int(Decimal(str(p)).quantize(Decimal("0.01")) * 100)
        d = int(str(cents)[0])
        counts[d] = counts.get(d, 0) + 1
    got = {
        r.digit: r for r in QUERIES["benford_price_audit"](spark, SF_SMALL).collect()
    }
    assert {d: r.observed for d, r in got.items()} == counts
    total = sum(counts.values())
    chi2 = 0.0
    for d, r in got.items():
        exp = math.log10(1 + 1 / d)
        assert math.isclose(r.expected, exp, rel_tol=1e-15)
        assert math.isclose(r.share, counts[d] / total, rel_tol=1e-12)
        term = (counts[d] - exp * total) ** 2 / (exp * total)
        assert math.isclose(r.chi2_term, term, rel_tol=1e-9)
        chi2 += term
    # shares are a partition of the order population
    assert math.isclose(sum(r.share for r in got.values()), 1.0, rel_tol=1e-12)


# --- seasonal-naive backtest --------------------------------------------------


def test_mase_perfect_seasonality_and_replay(spark, tmp_path):
    """A perfectly 24h-periodic series has zero seasonal-naive error
    (MASE 0); a constant series has NULL MASE (0/0 guarded); a type
    too short for any 24h pair is absent."""
    rows = []
    # 'daily': 3 days of a repeating 24h pattern
    for day in range(3):
        for h in range(24):
            rows.append(
                (day * 100 + h, (day * 24 + h) * 3600, 1, "daily", 10.0 + h)
            )
    # 'flat': constant over 48 hours → sae1 = 0 → NULL mase
    rows += [(1000 + h, h * 3600, 2, "flat", 5.0) for h in range(48)]
    # 'short': 3 hours only → no 24h pair → absent
    rows += [(2000 + h, h * 3600, 3, "short", 1.0 + h) for h in range(3)]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.event_type: r
        for r in QUERIES["seasonal_naive_backtest"](spark, d).collect()
    }
    assert set(got) == {"daily", "flat"}
    assert got["daily"].n_forecasts == 48  # days 2,3 each score 24 hours
    assert got["daily"].mae_seasonal == 0.0
    assert got["daily"].mase == 0.0
    assert got["flat"].mae_seasonal == 0.0
    assert got["flat"].mase is None


def test_mase_python_replay_on_real_data(spark):
    hourly: dict = {}
    for r in (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "event_type", "value")
        .collect()
    ):
        h = r.t - r.t % 3600
        key = (r.event_type, h)
        hourly[key] = hourly.get(key, Decimal(0)) + Decimal(str(r.value)).quantize(
            Decimal("0.01")
        )
    legs: dict = {}
    for (et, h), x in hourly.items():
        for shift, leg in ((86400, "s24"), (3600, "s1")):
            prev = hourly.get((et, h - shift))
            if prev is not None:
                sae, n = legs.get((et, leg), (Decimal(0), 0))
                legs[(et, leg)] = (sae + abs(x - prev), n + 1)
    got = {
        r.event_type: r
        for r in QUERIES["seasonal_naive_backtest"](spark, SF_SMALL).collect()
    }
    types24 = {et for (et, leg) in legs if leg == "s24"}
    assert set(got) == types24
    for et in types24:
        sae24, n24 = legs[(et, "s24")]
        assert got[et].n_forecasts == n24
        mae24 = float(sae24) / n24
        assert got[et].mae_seasonal == mae24
        if (et, "s1") in legs and legs[(et, "s1")][0] != 0:
            sae1, n1 = legs[(et, "s1")]
            assert got[et].mase == mae24 / (float(sae1) / n1)


# --- Theil–Sen ----------------------------------------------------------------


def test_theil_sen_linear_and_outlier_robust(spark, tmp_path):
    """On an exactly linear hourly series every pair slope equals the
    true slope; corrupting ONE point leaves the median slope exact
    (the estimator's 29% breakdown point is the reason it exists)."""
    rows = [(h, h * 3600, 1, "lin", 100.0 + 2.5 * h) for h in range(30)]
    rows += [
        (100 + h, h * 3600, 2, "dirty", 100.0 + 2.5 * h)
        if h != 15
        else (100 + h, h * 3600, 2, "dirty", 9999.0)
        for h in range(30)
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.event_type: r
        for r in QUERIES["theil_sen_hourly_trend"](spark, d).collect()
    }
    assert got["lin"].trend_per_hour == 2.5
    assert got["dirty"].trend_per_hour == 2.5
    # 30 in-band points → all C(30,2) pairs (band is 7 days)
    assert got["lin"].n_pairs == 30 * 29 // 2


def test_theil_sen_python_replay_on_real_data(spark):
    """Lower-median selection replayed exactly: sort (slope, t1, t2),
    pick rank (n+1)//2."""
    hourly: dict = {}
    for r in (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "event_type", "value")
        .collect()
    ):
        h = r.t - r.t % 3600
        key = (r.event_type, h)
        hourly[key] = hourly.get(key, Decimal(0)) + Decimal(str(r.value)).quantize(
            Decimal("0.01")
        )
    series: dict = {}
    for (et, h), x in hourly.items():
        series.setdefault(et, []).append((h, x))
    got = {
        r.event_type: r
        for r in QUERIES["theil_sen_hourly_trend"](spark, SF_SMALL).collect()
    }
    for et, pts in series.items():
        pts.sort()
        slopes = [
            (float(x2 - x1) / (t2 - t1) * 3600, t1, t2)
            for i, (t1, x1) in enumerate(pts)
            for (t2, x2) in pts[i + 1 :]
            if t2 <= t1 + 604800
        ]
        if not slopes:
            assert et not in got
            continue
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1][0]
        assert got[et].n_pairs == len(slopes)
        assert got[et].trend_per_hour == med


# --- cross-correlation --------------------------------------------------------


def test_ccf_planted_lead_lag(spark, tmp_path):
    """'fol' is an exact one-hour-delayed copy of 'lead': the CCF peaks
    at exactly 1.0 at lag +1 (type_b observed 1h earlier ≡ type_a now)
    and stays below it everywhere else."""
    vals = [float((7 * h * h + 3 * h) % 97) for h in range(40)]
    rows = [(h, h * 3600, 1, "lead", vals[h]) for h in range(40)]
    rows += [(100 + h, h * 3600, 2, "fol", vals[h - 1]) for h in range(1, 40)]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.lag_hours: r.ccf
        for r in QUERIES["hourly_crosscorr_leadlag"](spark, d).collect()
    }
    assert set(got) == {-2, -1, 0, 1, 2}
    assert math.isclose(got[1], 1.0, rel_tol=1e-12)
    for lag in (-2, -1, 0, 2):
        assert got[lag] < 0.99


def test_ccf_matches_numpy_on_real_data(spark):
    import numpy as np

    hourly: dict = {}
    for r in (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "event_type", "value")
        .collect()
    ):
        h = r.t - r.t % 3600
        key = (r.event_type, h)
        hourly[key] = hourly.get(key, Decimal(0)) + Decimal(str(r.value)).quantize(
            Decimal("0.01")
        )
    got = {
        (r.type_a, r.type_b, r.lag_hours): r
        for r in QUERIES["hourly_crosscorr_leadlag"](spark, SF_SMALL).collect()
    }
    types = sorted({et for et, _ in hourly})
    checked = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            for lag in (-2, -1, 0, 1, 2):
                xs, ys = [], []
                for (et, h), x in hourly.items():
                    if et != ta:
                        continue
                    y = hourly.get((tb, h - lag * 3600))
                    if y is not None:
                        xs.append(float(x))
                        ys.append(float(y))
                key = (ta, tb, lag)
                if not xs:
                    assert key not in got
                    continue
                r = got[key]
                assert r.n_pairs == len(xs)
                if len(xs) < 2 or np.std(xs) == 0 or np.std(ys) == 0:
                    assert r.ccf is None
                    continue
                want = float(np.corrcoef(xs, ys)[0, 1])
                assert math.isclose(r.ccf, want, rel_tol=1e-6, abs_tol=1e-9)
                checked += 1
    assert checked >= 10  # the fixture really exercises the matrix


# --- Mann–Kendall -------------------------------------------------------------


def test_mann_kendall_planted_monotone(spark, tmp_path):
    """Strictly increasing daily totals: S = n(n-1)/2 (every pair
    concordant), no ties, z from the closed form, trend='increasing';
    a strictly decreasing twin mirrors to 'decreasing'."""
    n = 12
    rows = [(d, d * 86400, 1, "up", 10.0 + d) for d in range(n)]
    rows += [(100 + d, d * 86400, 1, "down", 50.0 - d) for d in range(n)]
    d = _write_events(spark, tmp_path, rows)
    got = {r.event_type: r for r in QUERIES["mann_kendall_daily_trend"](spark, d).collect()}
    s_max = n * (n - 1) // 2
    var = n * (n - 1) * (2 * n + 5) / 18.0
    assert got["up"].s_stat == s_max and got["down"].s_stat == -s_max
    assert math.isclose(got["up"].var_s, round(var, 6))
    assert math.isclose(got["up"].z_stat, round((s_max - 1) / math.sqrt(var), 6))
    assert got["up"].trend == "increasing"
    assert got["down"].trend == "decreasing"
    assert math.isclose(got["down"].z_stat, -got["up"].z_stat, abs_tol=1e-9)


def test_mann_kendall_constant_series_null_z(spark, tmp_path):
    """A constant daily series is ONE tie group of size n: the tie term
    cancels the variance exactly → var_s = 0, z NULL, 'no_trend'."""
    rows = [(d, d * 86400, 1, "flat", 7.0) for d in range(9)]
    d = _write_events(spark, tmp_path, rows)
    (r,) = QUERIES["mann_kendall_daily_trend"](spark, d).collect()
    assert r.s_stat == 0 and r.var_s == 0.0
    assert r.z_stat is None and r.trend == "no_trend"


def test_mann_kendall_python_replay_on_real_data(spark):
    """Textbook S / tie-corrected variance replay (exact Decimal daily
    totals) equals the engine on the real fixture."""
    ev = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "event_type", "value")
        .collect()
    )
    daily: dict = {}
    for r in ev:
        key = (r.event_type, r.t - r.t % 86400)
        daily[key] = daily.get(key, Decimal(0)) + Decimal(str(r.value)).quantize(
            Decimal("0.01")
        )
    got = {
        r.event_type: r
        for r in QUERIES["mann_kendall_daily_trend"](spark, SF_SMALL).collect()
    }
    types = sorted({et for et, _ in daily})
    for et in types:
        xs = [x for (t, _), x in sorted(daily.items()) if t == et]
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        groups: dict = {}
        for x in xs:
            groups[x] = groups.get(x, 0) + 1
        tie = sum(t * (t - 1) * (2 * t + 5) for t in groups.values())
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        r = got[et]
        assert r.n_days == n and r.s_stat == s
        assert math.isclose(r.var_s, round(var, 6), abs_tol=1e-9)
        if var > 0:
            cc = s - (1 if s > 0 else -1 if s < 0 else 0)
            assert math.isclose(r.z_stat, round(cc / math.sqrt(var), 6), abs_tol=1e-9)


# --- burstiness ---------------------------------------------------------------


def test_burstiness_periodic_is_minus_one(spark, tmp_path):
    """Perfectly periodic per-user arrivals: σ = 0 → CV = 0 and
    B = (0−μ)/(0+μ) = −1, the Goh–Barabási periodic pole."""
    rows = [(u * 100 + k, u * 7 + k * 600, u, "tick", 1.0)
            for u in range(3) for k in range(20)]
    d = _write_events(spark, tmp_path, rows)
    (r,) = QUERIES["interarrival_burstiness"](spark, d).collect()
    assert r.n_gaps == 3 * 19
    assert r.mean_gap_sec == 600.0 and r.cv_gap == 0.0 and r.burstiness == -1.0


def test_burstiness_python_replay_on_real_data(spark):
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select(
            F.col("ts").cast("long").alias("t"), "event_id", "user_id", "event_type"
        )
        .collect()
    )
    seqs: dict = {}
    for r in sorted(ev, key=lambda r: (r.t, r.event_id)):
        seqs.setdefault((r.user_id, r.event_type), []).append(r.t)
    gaps: dict = {}
    for (_, et), ts in seqs.items():
        for a, b in zip(ts, ts[1:]):
            gaps.setdefault(et, []).append(b - a)
    got = {
        r.event_type: r
        for r in QUERIES["interarrival_burstiness"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(gaps)
    for et, gs in gaps.items():
        n, s, q = len(gs), float(sum(gs)), float(sum(g * g for g in gs))
        mean = s / n
        sd = math.sqrt((q - s * s / n) / n)
        r = got[et]
        assert r.n_gaps == n
        assert r.mean_gap_sec == round(mean, 6)
        assert math.isclose(r.cv_gap, round(sd / mean, 6), abs_tol=1e-9)
        assert math.isclose(
            r.burstiness, round((sd - mean) / (sd + mean), 6), abs_tol=1e-9
        )


# --- Spearman -----------------------------------------------------------------


def test_spearman_monotone_nonlinear_is_one(spark, tmp_path):
    """A strictly monotone but wildly nonlinear relation (y = x³ scale)
    gets rho exactly 1 — the scale-free property Pearson lacks — and
    the anti-monotone twin gets exactly −1."""
    rows = []
    for d in range(15):
        rows.append((d, d * 86400, 1, "aa", float(1 + d)))
        rows.append((100 + d, d * 86400, 2, "bb", float((1 + d) ** 3 % 7919) + d * 1e4))
        rows.append((200 + d, d * 86400, 3, "cc", float(15 - d)))
    # bb must be monotone in d: (1+d)^3 mod p is not — rebuild plainly
    rows = []
    for d in range(15):
        rows.append((d, d * 86400, 1, "aa", float(1 + d)))
        rows.append((100 + d, d * 86400, 2, "bb", float((1 + d) ** 3)))
        rows.append((200 + d, d * 86400, 3, "cc", float(15 - d)))
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r.type_a, r.type_b): r.rho
        for r in QUERIES["spearman_daily_corr"](spark, d).collect()
    }
    assert got[("aa", "bb")] == 1.0
    assert got[("aa", "cc")] == -1.0
    assert got[("bb", "cc")] == -1.0


def test_spearman_average_rank_ties_replay(spark):
    """Engine ≡ python average-rank Spearman (the textbook tie
    treatment: Pearson over midranks) on the real fixture."""
    import numpy as np

    hourly: dict = {}
    for r in (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("value").isNotNull())
        .select(F.col("ts").cast("long").alias("t"), "event_type", "value")
        .collect()
    ):
        d = r.t - r.t % 86400
        key = (r.event_type, d)
        hourly[key] = hourly.get(key, Decimal(0)) + Decimal(str(r.value)).quantize(
            Decimal("0.01")
        )
    types = sorted({et for et, _ in hourly})

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            for k in range(i, j + 1):
                ranks[order[k]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    got = {
        (r.type_a, r.type_b): (r.n_days, r.rho)
        for r in QUERIES["spearman_daily_corr"](spark, SF_SMALL).collect()
    }
    checked = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            days = sorted(
                d for et, d in hourly if et == ta and (tb, d) in hourly
            )
            if not days:
                assert (ta, tb) not in got
                continue
            xa = [float(hourly[(ta, d)]) for d in days]
            xb = [float(hourly[(tb, d)]) for d in days]
            ra, rb = midranks(xa), midranks(xb)
            n, rho_want = len(days), None
            if np.std(ra) > 0 and np.std(rb) > 0:
                rho_want = float(np.corrcoef(ra, rb)[0, 1])
            n_got, rho_got = got[(ta, tb)]
            assert n_got == n
            if rho_want is None:
                assert rho_got is None
            else:
                # engine ships round(rho, 6); numpy's op order differs in
                # the last ulps, so compare at the rounding granularity
                assert math.isclose(rho_got, rho_want, abs_tol=1e-6)
                checked += 1
    assert checked >= 8


# --- Markov steady state --------------------------------------------------------


def test_markov_planted_two_state_chain(spark, tmp_path):
    """One user alternating a,b,a,b...: P(a->b)=P(b->a)=1 gives the
    period-2 chain whose power iterates from uniform stay exactly
    (0.5, 0.5); a second user chain with a self-loop breaks symmetry
    toward the analytic stationary solution."""
    rows = []
    for k in range(21):
        rows.append((k, k * 60, 1, "a" if k % 2 == 0 else "b", 1.0))
    d = _write_events(spark, tmp_path, rows)
    got = {r.state: r for r in QUERIES["markov_steady_state"](spark, d).collect()}
    assert got["a"].steady_prob == 0.5 and got["b"].steady_prob == 0.5
    assert abs(sum(r.steady_prob for r in got.values()) - 1.0) < 1e-6


def test_markov_dangling_state_teleports(spark, tmp_path):
    """A type appearing only as a TARGET (user stream a->b ends) gets
    the uniform teleport row: mass is conserved and both states keep
    positive stationary share (analytically pi = (1/3, 2/3))."""
    rows = [(0, 0, 1, "a", 1.0), (1, 60, 1, "b", 1.0)]
    d = _write_events(spark, tmp_path, rows)
    got = {r.state: r for r in QUERIES["markov_steady_state"](spark, d).collect()}
    assert set(got) == {"a", "b"}
    assert abs(sum(r.steady_prob for r in got.values()) - 1.0) < 1e-6
    assert abs(got["a"].steady_prob - 1 / 3) < 0.01
    assert abs(got["b"].steady_prob - 2 / 3) < 0.01
    assert got["b"].target_share == 1.0  # the one observed transition


def test_markov_python_power_replay(spark):
    """Engine ≡ a python power iteration with the SAME ordered fold
    (terms added in source-state sort order) on the real fixture, and
    the stationary vector lands near the empirical target share (the
    chain is well-mixed)."""
    import pyspark.sql.functions as F

    ev = (
        load_table(spark, SF_SMALL, "events")
        .select(F.col("ts").cast("long").alias("t"), "event_id", "user_id", "event_type")
        .collect()
    )
    seqs: dict = {}
    for r in sorted(ev, key=lambda r: (r.t, r.event_id)):
        seqs.setdefault(r.user_id, []).append(r.event_type)
    tr: dict = {}
    for s in seqs.values():
        for a, b in zip(s, s[1:]):
            tr[(a, b)] = tr.get((a, b), 0) + 1
    states = sorted({a for a, _ in tr} | {b for _, b in tr})
    rowtot: dict = {}
    for (a, _), n in tr.items():
        rowtot[a] = rowtot.get(a, 0) + n
    p: dict = {}
    for (a, b), n in tr.items():
        p[(a, b)] = n / rowtot[a]
    for a in states:
        if a not in rowtot:
            for b in states:
                p[(a, b)] = 1.0 / len(states)
    x = {s: 1.0 / len(states) for s in states}
    for _ in range(8):
        nx = {}
        for dst in states:
            acc = 0.0
            for src in sorted(states):
                if (src, dst) in p:
                    acc += x[src] * p[(src, dst)]
            nx[dst] = acc
        x = nx
    got = {r.state: r for r in QUERIES["markov_steady_state"](spark, SF_SMALL).collect()}
    assert set(got) == set(states)
    tot = sum(tr.values())
    for s in states:
        assert got[s].steady_prob == round(x[s], 6)
        share = sum(n for (a, b), n in tr.items() if b == s) / tot
        assert got[s].target_share == round(share, 6)
        assert abs(got[s].steady_prob - share) < 0.05  # well-mixed chain


# --- offline changepoint --------------------------------------------------------


def test_changepoint_planted_level_shift(spark, tmp_path):
    """Daily totals 10×5 days then 20×5 days: the best split is after
    day 4 (5 days before), means exactly 10 and 20."""
    from depositaja_spark import registry

    day = 86400
    rows = [(i, i * day, 1, "view", 10.0) for i in range(5)]
    rows += [(5 + i, (5 + i) * day, 1, "view", 20.0) for i in range(5)]
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["changepoint_daily_value"](spark, d).collect()
    assert (got.split_day, got.n_days, got.n_days_before) == (4, 10, 5)
    assert got.mean_before == 10.0 and got.mean_after == 20.0


def test_changepoint_flat_series_deterministic_tiebreak(spark, tmp_path):
    """A constant series has g(t)=0 everywhere: the day-ASC tie-break
    must pick the FIRST split on both engines, not an arbitrary one."""
    from depositaja_spark import registry

    day = 86400
    rows = [(i, i * day, 1, "view", 7.0) for i in range(6)]
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["changepoint_daily_value"](spark, d).collect()
    assert got.split_day == 0 and got.n_days_before == 1


# --- max drawdown ---------------------------------------------------------------


def test_max_drawdown_planted(spark, tmp_path):
    """Daily series 10, 20, 5, 8, 30: running 10/30/35/43/73, peak
    10/30/35/43/73... wait — cumulative: 10,30,35,43,73; peaks equal the
    running max of the cumulative; all values positive so drawdown is 0
    everywhere.  Use a negative dip via small values: cumulative never
    falls, so plant the dip with value sums per day of 10, 1, 1, 50:
    the drawdown of a nondecreasing series is 0 and the tie-break picks
    the first day."""
    from depositaja_spark import registry

    day = 86400
    rows = [(i, i * day, 1, "view", v)
            for i, v in enumerate([10.0, 1.0, 1.0, 50.0])]
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["max_drawdown_daily"](spark, d).collect()
    assert (got.n_days, got.trough_day, got.max_drawdown) == (4, 0, 0.0)


def test_max_drawdown_with_negative_values(spark, tmp_path):
    """Signed values create a real dip: daily sums 10, -4, -3, 12 →
    cumulative 10, 6, 3, 15; peak 10 until day 3 → max drawdown 7 at
    day 2, peak 10."""
    from depositaja_spark import registry

    day = 86400
    rows = [(i, i * day, 1, "view", v)
            for i, v in enumerate([10.0, -4.0, -3.0, 12.0])]
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["max_drawdown_daily"](spark, d).collect()
    assert (got.trough_day, got.peak_value, got.max_drawdown) == (2, 10.0, 7.0)


# --- cohort LTV matrix ----------------------------------------------------------


def test_cohort_ltv_planted(spark, tmp_path):
    """Two users in cohort 0 (days 0, 35) and one in cohort 1 (day 40):
    cohort 0 has ages 0 and 1; cumulative per-user value is exact."""
    from depositaja_spark import registry

    day = 86400
    rows = [
        (0, 0 * day, 1, "view", 10.0),     # u1 cohort 0 age 0
        (1, 35 * day, 1, "view", 20.0),    # u1 age 1
        (2, 5 * day, 2, "view", 30.0),     # u2 cohort 0 age 0
        (3, 40 * day, 3, "view", 40.0),    # u3 cohort 1 age 0
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r.cohort_period, r.age_periods): (r.n_users, r.cum_value_per_user)
        for r in registry.QUERIES["cohort_ltv_matrix"](spark, d).collect()
    }
    assert got[(0, 0)] == (2, 20.0)     # (10+30)/2
    assert got[(0, 1)] == (2, 30.0)     # (10+30+20)/2
    assert got[(1, 0)] == (1, 40.0)


# --- missing hours --------------------------------------------------------------


def test_missing_hours_planted(spark, tmp_path):
    """Events at hours 0, 1, 3 (skipping hour 2): span 4, observed 3,
    missing 1, coverage 0.75."""
    from depositaja_spark import registry

    rows = [(i, h * 3600 + 10, 1, "view", 1.0)
            for i, h in enumerate([0, 1, 3, 3])]
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["missing_hours_report"](spark, d).collect()
    assert (got.expected_hours, got.observed_hours, got.missing_hours) == (4, 3, 1)
    assert got.coverage == 0.75


# --- Holt-Winters ---------------------------------------------------------------


def test_holt_winters_matches_python_replay(spark, tmp_path):
    """The array-fold equals a pure-Python replay of the identical
    recurrence (same op order → same doubles, asserted EXACTLY), the
    warm-up contract holds (t<=m: level==value, seasonal==0), and the
    forecast adds the lag-(m-1) seasonal."""
    from depositaja_spark import registry
    from depositaja_spark.queries_temporal import _HW_A, _HW_B, _HW_G, _HW_PERIOD

    day = 86400
    # 21 days: weekly pattern + mild trend, one event per day
    vals = [100.0 + 3 * t + [0, 10, -5, 20, 0, -10, 5][t % 7] for t in range(21)]
    rows = [(t, t * day + 30, 1, "view", v) for t, v in enumerate(vals)]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.day: r
        for r in registry.QUERIES["holt_winters_daily_value"](spark, d).collect()
    }
    a, b, g, m = _HW_A, _HW_B, _HW_G, _HW_PERIOD
    l = bb = None
    ls, bs, ss = [], [], []
    for t, x in enumerate(vals, start=1):
        if t <= m:
            l_new, b_new, s_new = float(x), 0.0, 0.0
        else:
            l_new = a * (x - ss[t - m - 1]) + (1.0 - a) * (ls[-1] + bs[-1])
            b_new = b * (l_new - ls[-1]) + (1.0 - b) * bs[-1]
            s_new = g * (x - l_new) + (1.0 - g) * ss[t - m - 1]
        ls.append(l_new)
        bs.append(b_new)
        ss.append(s_new)
    for t in range(1, 22):
        r = got[t - 1]
        assert r.level == ls[t - 1], t
        assert r.trend == bs[t - 1], t
        assert r.seasonal == ss[t - 1], t
        s_lag = ss[t - m] if t >= m else 0.0
        assert r.forecast == ls[t - 1] + bs[t - 1] + s_lag, t
    # warm-up contract
    for t in range(1, m + 1):
        assert got[t - 1].level == vals[t - 1] and got[t - 1].seasonal == 0.0


def test_holt_winters_seasonal_term_improves_forecast(spark, tmp_path):
    """On an exactly periodic series, the one-step forecast WITH the
    seasonal term must beat the seasonal-blind level+trend forecast
    built from the SAME fold state — the direct proof the seasonal
    component carries signal."""
    from depositaja_spark import registry

    day = 86400
    pattern = [50.0, 80.0, 20.0, 100.0, 60.0, 10.0, 90.0]
    vals = pattern * 12  # 84 days
    rows = [(t, t * day + 30, 1, "view", v) for t, v in enumerate(vals)]
    d = _write_events(spark, tmp_path, rows)
    rows_out = sorted(
        registry.QUERIES["holt_winters_daily_value"](spark, d).collect(),
        key=lambda r: r.day,
    )
    # row t's forecast predicts row t+1: pair consecutive rows
    pairs = list(zip(rows_out[-29:-1], rows_out[-28:]))
    with_s = sum(abs(a.forecast - b.value) for a, b in pairs) / len(pairs)
    blind = sum(
        abs(a.level + a.trend - b.value) for a, b in pairs
    ) / len(pairs)
    assert with_s < 0.5 * blind
