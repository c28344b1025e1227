"""A1 — collector: full per-wallet deposit history (SURVEY.md §2.3).

The reference's collector appends every deposit to a per-wallet
``DepositHistory`` list held in keyed state (collector/collector.go:17-29),
i.e. an unbounded collect-list.  Batch Spark expresses this as a single
hash aggregation; at scale it is one shuffle on the key with map-side
partial aggregation, and the per-wallet list is bounded by that wallet's
event count (no driver-side collection anywhere).

The streaming engine deliberately does NOT maintain this list as operator
state: the raw event log is already the history (the reference itself
computes balance lazily from the list at read time, service/service.go:137-140
— we promote that to a design principle and keep the log as the source of
truth; see streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deposit_history(deposits: DataFrame, ordered: bool = True) -> DataFrame:
    """deposits(wallet_id, amount, ts, seq) → (wallet_id, deposits array).

    Output value shape matches pb.DepositHistory (proto/wallet.proto:19-22):
    ``deposits: array<struct<wallet_id, amount>>``.  ``ordered=True`` sorts
    each list by arrival order (the reference appends in Kafka-offset order);
    sorting happens inside each aggregated row via ``array_sort`` on a
    (seq, ...) struct — no extra shuffle.
    """
    if ordered:
        agg = F.array_sort(
            F.collect_list(F.struct(F.col("seq"), F.col("wallet_id"), F.col("amount")))
        )
        deposits_col = F.transform(
            agg, lambda x: F.struct(x["wallet_id"].alias("wallet_id"), x["amount"].alias("amount"))
        )
    else:
        deposits_col = F.collect_list(F.struct(F.col("wallet_id"), F.col("amount")))
    return deposits.groupBy("wallet_id").agg(deposits_col.alias("deposits"))
