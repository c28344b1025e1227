"""A4 — flagger: latest-value fold over flag events (SURVEY.md §2.3).

The reference folds each ``FlagEvent`` into a per-wallet ``FlagValue``
where the last event wins (flagger/flagger.go:40-57): an unflag event
stores ``{flagged: false, start: 0}``, a flag event stores
``{flagged: true, start: event.start}``.

Spark-native design: ``max_by(struct(payload), seq)`` — a single hash
aggregation (one shuffle, map-side partial ``max_by``), which scales
better than the window-function formulation (row_number over a partition
sort) because it never materializes the per-key sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_flag(flag_events: DataFrame) -> DataFrame:
    """flag_events(wallet_id, flag_removed, rolling_period_start_unix, seq)
    → (wallet_id, flagged, rolling_period_start_unix); last event per key wins.

    Output value shape matches pb.FlagValue (proto/flagger.proto:20-23).
    The conditional projection mirrors flagger/flagger.go:44-56: unflag
    zero-values the window anchor.
    """
    last = F.max_by(
        F.struct(F.col("flag_removed"), F.col("rolling_period_start_unix")), F.col("seq")
    )
    folded = flag_events.groupBy("wallet_id").agg(last.alias("last"))
    return folded.select(
        "wallet_id",
        (~F.col("last.flag_removed")).alias("flagged"),
        F.when(F.col("last.flag_removed"), F.lit(0).cast("long"))
        .otherwise(F.col("last.rolling_period_start_unix"))
        .alias("rolling_period_start_unix"),
    )
