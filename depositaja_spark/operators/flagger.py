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


def latest_flag_from_windows(windowed: DataFrame, max_amount: float | None = None) -> DataFrame:
    """Fused P5+A4 for DETECTOR-derived flag events: (wallet_id,
    window_start_unix, received) → (wallet_id, flagged,
    rolling_period_start_unix) in ONE hash aggregation.

    Equivalent to ``latest_flag(flag_events(windowed))`` — the detector's
    event construction makes every struct field a function of
    (window_start_unix, received ≥ threshold), so the whole fold packs
    into a single BIGINT:

        packed = window_start_unix * 2 + (received ≥ threshold)

    ``max(packed)`` ranks (window, above) lexicographically (windows are
    unique per wallet after the detector's groupBy, so the +0/+1 bit never
    decides the max), and the last window's flag state unpacks as the low
    bit.  ``rolling_period_start_unix`` is reconstructible because the
    detector emits it as ``above ? window : 0`` and the A4 fold zero-values
    it again on unflag — for the LAST event both rules collapse to
    ``flagged ? window : 0``.  (Folds over arbitrary flag events — e.g.
    manual admin overrides, whose start field is independent of seq — must
    keep :func:`latest_flag`.)

    Why not the generic fold here: ``max_by(struct(..), seq)`` carries a
    struct-typed aggregation buffer, which Spark's hash aggregate cannot
    hold — the plan degrades to SortAggregate with a per-partition sort on
    BOTH sides of the exchange (4 operators for r12's check_all).  The
    packed-long ``max`` is a plain mutable-buffer HashAggregate: no sorts,
    and the exchange moves one long instead of struct+long.  Pinned
    equivalent to the composed fold by tests/test_wallet_operators.py.
    """
    from depositaja_spark.schemas import MAX_AMOUNT

    if max_amount is None:
        max_amount = MAX_AMOUNT
    above = (F.col("received") >= F.lit(max_amount)).cast("long")
    packed = F.max(F.col("window_start_unix") * 2 + above)
    folded = windowed.groupBy("wallet_id").agg(packed.alias("_p"))
    flagged = F.col("_p").bitwiseAND(F.lit(1)) == 1
    return folded.select(
        "wallet_id",
        flagged.alias("flagged"),
        F.when(flagged, F.shiftright(F.col("_p"), 1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rolling_period_start_unix"),
    )


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
