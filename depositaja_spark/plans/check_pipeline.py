"""The flagship plan: the entire reference pipeline as ONE declarative query.

validate (P1) → balance (A2) → windowed detector (A3) → threshold (P4) →
flag events (P5) → latest flag (A4) → check join (J1) — i.e. the complete
answer to "what would ``GET /check`` return for every wallet", computed
from the raw deposit stream in a single Catalyst-planned job.

Scale notes: two keyed aggregations (balance on wallet_id; detector on
(wallet_id, window)) each shuffle once with map-side partial agg; the flag
fold reduces the detector output (≤ one row per wallet-window) before the
final join, whose flags side is tiny relative to events and broadcasts
under AQE.  No collect, no Python in the hot path, whole-stage codegen
end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from depositaja_spark.operators.balance import balance_per_wallet
from depositaja_spark.operators.check import check_all
from depositaja_spark.operators.detector import window_received
from depositaja_spark.operators.flagger import latest_flag_from_windows
from depositaja_spark.operators.validate import valid_deposits


def check_pipeline(deposits: DataFrame, round_to: int | None = 4) -> DataFrame:
    """deposits(wallet_id, amount, ts, seq) → (wallet_id, balance, above_threshold)."""
    accepted = valid_deposits(deposits)
    balances = balance_per_wallet(accepted, round_to=round_to)
    windowed = window_received(accepted, round_to=round_to)
    # fused P5+A4 (r13 optimization): one packed-long HashAggregate replaces
    # the max_by(struct) SortAggregate pair — same values, no sorts
    flags = latest_flag_from_windows(windowed)
    return check_all(balances, flags)
