"""A3 + P4 + P5 — detector: rolling-period sum and threshold flagging
(SURVEY.md §2.3).

The reference keeps per-wallet state ``Counter{rolling_period_start_unix,
received}`` and, on every deposit, adds the amount, resets the window when
more than 120 processing-time seconds have passed since the window opened,
and emits a flag/unflag event depending on ``received >= 10000``
(detector/detector.go:47-75; constants :15-18).

That exact transition is processing-time-driven and therefore
nondeterministic; the engine ships TWO implementations (SURVEY.md §7):

* **this module** — the deterministic, oracle-checkable variant: per-wallet
  event-time TUMBLING 2-minute windows.  This is the Spark-native design:
  a single ``groupBy(wallet, window)`` hash aggregation, shuffle on
  (wallet, window) with partial aggregation, AQE-coalesced.  At 100 TB the
  window key also spreads a hot wallet's rows across time buckets, which is
  strictly better for skew than the reference's single-key state.
* **streaming/detector_state.py** — the faithful add-then-maybe-reset
  stateful replica (transformWithStateInPandas), behavior-tested with a
  controlled clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.schemas import MAX_AMOUNT, ROLLING_PERIOD_SECONDS


def window_received(
    deposits: DataFrame,
    period_seconds: int = ROLLING_PERIOD_SECONDS,
    round_to: int | None = None,
) -> DataFrame:
    """deposits → (wallet_id, window_start_unix, received).

    ``window_start_unix`` is the epoch-aligned tumbling-window start in
    seconds — the deterministic analog of the reference's
    ``rolling_period_start_unix`` (proto/detector.proto:15).  Computed as
    ``floor(epoch_seconds / period) * period`` so an external SQL oracle can
    reproduce it exactly.
    """
    win_start = (F.floor(F.col("ts").cast("long") / period_seconds) * period_seconds).alias(
        "window_start_unix"
    )
    received = F.sum("amount")
    if round_to is not None:
        received = F.round(received, round_to)
    return deposits.groupBy("wallet_id", win_start).agg(received.alias("received"))


def above_threshold_windows(
    windowed: DataFrame, max_amount: float = MAX_AMOUNT
) -> DataFrame:
    """P4 — the ``detectSpammer`` predicate (detector/detector.go:42-45):
    ``received >= threshold AND window open``.  A post-aggregation filter
    (SQL HAVING); Catalyst evaluates it on the agg output, no extra pass.
    """
    return windowed.filter(
        (F.col("received") >= max_amount) & F.col("window_start_unix").isNotNull()
    )


def flag_events(
    windowed: DataFrame, max_amount: float = MAX_AMOUNT
) -> DataFrame:
    """P5 — conditional flag-event construction (detector/detector.go:67-71).

    The reference emits on EVERY deposit: a flag event when the window sum
    is over threshold, an unflag event otherwise (which is how flags
    self-heal when the wallet deposits again).  The deterministic batch
    analog emits one event per (wallet, window): ``flag_removed = NOT
    above_threshold``, with ``rolling_period_start_unix`` carrying the
    window anchor for flags and 0 for unflags (the reference's unflag event
    zero-values the field, detector/detector.go:70).
    """
    above = F.col("received") >= max_amount
    return windowed.select(
        "wallet_id",
        (~above).alias("flag_removed"),
        F.when(above, F.col("window_start_unix"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rolling_period_start_unix"),
        F.col("window_start_unix").alias("seq"),
    )
