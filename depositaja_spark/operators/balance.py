"""A2 — balance: sum of accepted deposits per wallet (SURVEY.md §2.3).

The reference never stores a balance: ``GET /check`` folds
``sum(m.Amount)`` over the collector's deposit list at read time
(service/service.go:137-140).  The Spark-native engine computes the same
number as a keyed sum — one shuffle with map-side combine, the cheapest
possible plan, and the state per key is a single double instead of an
unbounded list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def balance_per_wallet(deposits: DataFrame, round_to: int | None = None) -> DataFrame:
    """deposits → (wallet_id, balance).

    ``round_to`` optionally rounds the sum (used by oracle-compared queries
    to erase float summation-order noise; source amounts are 2-decimal).
    """
    bal: Column = F.sum("amount")
    if round_to is not None:
        bal = F.round(bal, round_to)
    return deposits.groupBy("wallet_id").agg(bal.alias("balance"))


def balance_from_history(history: DataFrame, round_to: int | None = None) -> DataFrame:
    """The reference's literal read-path: fold the A1 list
    (service/service.go:137-140) — ``aggregate`` over the array, no shuffle
    since the history table is already keyed."""
    bal: Column = F.aggregate(
        F.col("deposits"), F.lit(0.0), lambda acc, x: acc + x["amount"]
    )
    if round_to is not None:
        bal = F.round(bal, round_to)
    return history.select("wallet_id", bal.alias("balance"))
