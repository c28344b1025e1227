"""Map the driver's ``events`` table onto the reference's deposit stream.

The reference's only input is the Kafka topic ``deposit`` carrying
``pb.Deposit{wallet_id: string, amount: double}`` messages keyed by wallet
(reference proto/wallet.proto:14-17; emit at service/service.go:99).  The
driver's synthetic ``events`` table plays that role in batch tests:
``purchase`` events are deposits, ``user_id`` is the wallet key (cast to
string to honor the proto's string key), ``value`` is the amount, ``ts`` is
event time and ``event_id`` the arrival order (Kafka-offset analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPOSIT_EVENT_TYPE = "purchase"


def deposits_from_events(events: DataFrame, event_type: str = DEPOSIT_EVENT_TYPE) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → deposits.

    Output columns: wallet_id string, amount double, ts timestamp, seq long.
    The filter + projection push down to the parquet scan (only 4 columns
    read, ``event_type`` predicate in PushedFilters).
    """
    return events.filter(F.col("event_type") == event_type).select(
        F.col("user_id").cast("string").alias("wallet_id"),
        F.col("value").alias("amount"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
    )
