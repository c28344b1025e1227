"""Wallet-domain operators — the reference's complete operator surface
(SURVEY.md §2), each as a declarative DataFrame transform."""

from depositaja_spark.operators.validate import valid_deposits, project_deposit, negate_withdrawals
from depositaja_spark.operators.collector import deposit_history
from depositaja_spark.operators.balance import balance_per_wallet
from depositaja_spark.operators.detector import (
    window_received,
    above_threshold_windows,
    flag_events,
)
from depositaja_spark.operators.flagger import latest_flag, latest_flag_from_windows
from depositaja_spark.operators.check import check_all, check_one, point_lookup
from depositaja_spark.operators.admin import merge_manual_flags

__all__ = [
    "valid_deposits",
    "project_deposit",
    "negate_withdrawals",
    "deposit_history",
    "balance_per_wallet",
    "window_received",
    "above_threshold_windows",
    "flag_events",
    "latest_flag",
    "latest_flag_from_windows",
    "check_all",
    "check_one",
    "point_lookup",
    "merge_manual_flags",
]
