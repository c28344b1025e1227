"""Golden end-to-end scenario tests (SURVEY.md §5.2 / FIXTURES.md).

A deterministic synthetic deposit sequence exercises every reference edge
case: rejected non-positive amounts, a wallet crossing the 10,000/2-min
threshold, flag self-heal on the next quiet window, manual overrides, and
the unknown-wallet default.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from depositaja_spark.operators import (
    balance_per_wallet,
    check_all,
    check_one,
    deposit_history,
    flag_events,
    latest_flag,
    merge_manual_flags,
    valid_deposits,
    window_received,
)
from depositaja_spark.operators.admin import manual_flag_events
from depositaja_spark.plans import check_pipeline
from depositaja_spark.schemas import DEPOSIT


def ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 0, minute, second, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def deposits(spark):
    rows = [
        # wallet a: two ordinary deposits in one 2-min window
        ("a", 100.0, ts(0, 10), 1),
        ("a", 50.0, ts(1, 50), 2),
        # wallet b: crosses the threshold inside window [2:00, 4:00)
        ("b", 6000.0, ts(2, 5), 3),
        ("b", 5000.0, ts(3, 40), 4),
        # wallet b again, later quiet window → detector emits unflag
        ("b", 10.0, ts(10, 0), 5),
        # wallet c: invalid amounts only (rejected by P1)
        ("c", 0.0, ts(4, 0), 6),
        ("c", -25.0, ts(5, 0), 7),
        # wallet d: one valid deposit
        ("d", 9999.99, ts(6, 0), 8),
    ]
    return spark.createDataFrame(rows, DEPOSIT)


def as_map(df, key="wallet_id"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_validation_filter(deposits):
    ok = valid_deposits(deposits)
    assert ok.count() == 6
    assert ok.filter(F.col("wallet_id") == "c").count() == 0


def test_balance(deposits):
    bal = as_map(balance_per_wallet(valid_deposits(deposits)))
    assert bal["a"]["balance"] == pytest.approx(150.0)
    assert bal["b"]["balance"] == pytest.approx(11010.0)
    assert "c" not in bal
    assert bal["d"]["balance"] == pytest.approx(9999.99)


def test_deposit_history_ordered(deposits):
    hist = as_map(deposit_history(valid_deposits(deposits), ordered=True))
    assert [d["amount"] for d in hist["b"]["deposits"]] == [6000.0, 5000.0, 10.0]
    # inner struct matches pb.DepositHistory: carries wallet_id too
    assert hist["a"]["deposits"][0]["wallet_id"] == "a"


def test_window_received_and_threshold(deposits):
    w = window_received(valid_deposits(deposits))
    rows = {(r.wallet_id, r.window_start_unix): r.received for r in w.collect()}
    base = int(ts(0).timestamp()) // 120 * 120
    # b's two deposits land in the same [2:00, 4:00) window
    assert rows[("b", base + 120)] == pytest.approx(11000.0)
    # b's later deposit opens its own window
    assert rows[("b", base + 600)] == pytest.approx(10.0)


def test_flag_lifecycle_self_heals(deposits):
    """The reference emits an unflag on every sub-threshold deposit
    (detector/detector.go:67-71), so b's quiet window at minute 10
    overwrites the flag from the hot window — latest event wins."""
    w = window_received(valid_deposits(deposits))
    flags = as_map(latest_flag(flag_events(w)))
    assert flags["b"]["flagged"] is False  # self-healed
    assert flags["b"]["rolling_period_start_unix"] == 0
    assert flags["a"]["flagged"] is False
    assert flags["d"]["flagged"] is False


def test_flagged_while_hot(deposits):
    """Restrict to events before the quiet window: b is flagged, and the
    flag value carries the window anchor (proto/detector.proto:15)."""
    early = deposits.filter(F.col("seq") <= 4)
    w = window_received(valid_deposits(early))
    flags = as_map(latest_flag(flag_events(w)))
    assert flags["b"]["flagged"] is True
    base = int(ts(0).timestamp()) // 120 * 120
    assert flags["b"]["rolling_period_start_unix"] == base + 120


def test_fused_flag_fold_equals_composed(deposits):
    """r13 optimization guard: latest_flag_from_windows (packed-long
    HashAggregate) must be value-identical to the composed
    latest_flag(flag_events(w)) fold on detector-derived events — full
    lifecycle (flag, self-heal, never-flagged) plus both restriction
    points of the golden scenario."""
    from depositaja_spark.operators import latest_flag_from_windows

    for pred in (None, F.col("seq") <= 4, F.col("seq") <= 3):
        d = deposits if pred is None else deposits.filter(pred)
        w = window_received(valid_deposits(d))
        composed = as_map(latest_flag(flag_events(w)))
        fused = as_map(latest_flag_from_windows(w))
        assert fused == composed


def test_fused_flag_fold_pre_epoch_windows(spark):
    """Packed-long fold must survive NEGATIVE window anchors (pre-1970
    event times): arithmetic shift right floors correctly and the low
    bit still carries the flag for odd negative packed values."""
    from datetime import datetime, timezone

    from depositaja_spark.operators import latest_flag_from_windows

    rows = [
        # pre-epoch: two windows, last one hot
        ("w", 5.0, datetime(1969, 12, 31, 23, 50, 0, tzinfo=timezone.utc), 1),
        ("w", 20000.0, datetime(1969, 12, 31, 23, 58, 0, tzinfo=timezone.utc), 2),
        # pre-epoch: flag then self-heal
        ("x", 20000.0, datetime(1969, 12, 31, 23, 50, 0, tzinfo=timezone.utc), 3),
        ("x", 5.0, datetime(1969, 12, 31, 23, 58, 0, tzinfo=timezone.utc), 4),
    ]
    d = spark.createDataFrame(rows, DEPOSIT)
    w = window_received(valid_deposits(d))
    composed = as_map(latest_flag(flag_events(w)))
    fused = as_map(latest_flag_from_windows(w))
    assert fused == composed
    assert fused["w"]["flagged"] is True
    assert fused["w"]["rolling_period_start_unix"] < 0  # real pre-epoch anchor
    assert fused["x"]["flagged"] is False


def test_check_all_defaults(deposits):
    out = as_map(check_pipeline(deposits))
    assert out["a"] == {"wallet_id": "a", "balance": 150.0, "above_threshold": False}
    assert out["b"]["balance"] == pytest.approx(11010.0)
    assert out["b"]["above_threshold"] is False
    assert "c" not in out  # never accepted a deposit


def test_check_one_unknown_wallet(spark, deposits):
    """service/service.go:119-133 — unknown wallets answer {0, false}."""
    d = valid_deposits(deposits)
    balances = balance_per_wallet(d)
    flags = latest_flag(flag_events(window_received(d)))
    row = check_one(balances, flags, "never-seen").collect()
    assert len(row) == 1
    assert row[0].asDict() == {
        "wallet_id": "never-seen",
        "balance": 0.0,
        "above_threshold": False,
    }


def test_manual_override_wins_by_seq(spark, deposits):
    """cmd/flag-wallet/main.go: a manual flag (start always 0) with the
    highest seq beats automatic events; a later automatic event would beat
    it back."""
    w = window_received(valid_deposits(deposits))
    auto = flag_events(w)
    manual = manual_flag_events(spark, [("b", False, 10**15), ("a", True, 10**15)])
    flags = as_map(latest_flag(merge_manual_flags(auto, manual)))
    assert flags["b"]["flagged"] is True
    assert flags["b"]["rolling_period_start_unix"] == 0  # manual never sets it
    assert flags["a"]["flagged"] is False


def test_balance_order_insensitive(spark, deposits):
    """Property: balance is arrival-order independent."""
    shuffled = deposits.orderBy(F.desc("seq"))
    a = as_map(balance_per_wallet(valid_deposits(deposits)))
    b = as_map(balance_per_wallet(valid_deposits(shuffled)))
    assert a == b
