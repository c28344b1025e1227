"""The faithful detector state machine (A3 exact semantics) as a custom
stateful streaming operator.

Replicates reference detector/detector.go:47-75 transition-for-transition,
per wallet, per deposit in arrival order:

    received += amount                                   (:54)
    if start == 0:            start = now                (:56-57)
    elif now - start > 120s:  start = 0; received = 0    (:59-62)
        # note: the reset ALSO discards the current deposit's amount,
        # because the add happened first — a reference quirk we preserve
    persist {start, received}                            (:64)
    emit flag  (removed=False, start)  if received >= 10000 and start != 0
    emit unflag(removed=True,  0)      otherwise         (:67-71)

The reference drives ``now`` from the wall clock (processing time,
time.Now() at :57,:59) which is untestable; here the clock is the event's
own ``clock`` column (event time by default — set it to a processing-time
column to reproduce the reference's nondeterministic behavior bit-for-bit).

Implemented with ``applyInPandasWithState``: keyed state co-partitioned
with the input stream — exactly Goka's model of a processor owning the
state for its partitions — held in the RocksDB state store and restored
from the checkpoint on restart (the analog of replaying the log-compacted
table topic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

from depositaja_spark.schemas import MAX_AMOUNT, ROLLING_PERIOD_SECONDS

#: state = pb.Counter (proto/detector.proto:14-17) minus the key
STATE_SCHEMA = T.StructType(
    [
        T.StructField("rolling_period_start_unix", T.LongType()),
        T.StructField("received", T.DoubleType()),
    ]
)

#: one output event per input deposit, FlagEvent-shaped + diagnostics
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("wallet_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("flag_removed", T.BooleanType()),
        T.StructField("rolling_period_start_unix", T.LongType()),
        T.StructField("received", T.DoubleType()),
    ]
)


_OUT_COLS = [
    "wallet_id",
    "seq",
    "flag_removed",
    "rolling_period_start_unix",
    "received",
]


def _replay(
    wallet_id: str,
    pdf: pd.DataFrame,
    start: int,
    received: float,
    period_s: int = ROLLING_PERIOD_SECONDS,
) -> tuple[list[tuple], int, float]:
    """The literal detector/detector.go:51-71 transition over one key's
    rows in arrival order; returns emitted events + final state.
    ``period_s`` defaults to the reference's rolling period — tests pass
    a short one so the timer variant can be compared in real time."""
    out: list[tuple] = []
    # per-key arrival order (Kafka offset / seq) — Goka guarantees this by
    # processing one callback at a time per partition
    pdf = pdf.sort_values("seq")
    for row in pdf.itertuples(index=False):
        now = int(row.clock)
        received += float(row.amount)
        if start == 0:
            start = now
        elif now - start > period_s:
            # reset swallows the current deposit too (add happened first)
            start = 0
            received = 0.0
        flagged = received >= MAX_AMOUNT and start != 0
        out.append(
            (wallet_id, int(row.seq), not flagged, start if flagged else 0, received)
        )
    return out, start, received


def _make_transition(period_s: int):
    def _transition(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (wallet_id,) = key
        if state.exists:
            start, received = state.get
        else:
            start, received = 0, 0.0

        out: list[tuple] = []
        for pdf in pdfs:
            emitted, start, received = _replay(
                wallet_id, pdf, start, received, period_s
            )
            out.extend(emitted)

        state.update((start, received))
        yield pd.DataFrame(out, columns=_OUT_COLS)

    return _transition


#: default-period transition (kept for checkpoint-restored callers)
_transition = _make_transition(ROLLING_PERIOD_SECONDS)


def exact_detector(
    deposits: DataFrame,
    clock_col: str = "ts",
    period_s: int = ROLLING_PERIOD_SECONDS,
) -> DataFrame:
    """deposits(wallet_id, amount, ts, seq) stream → FlagEvent stream with
    the reference's exact add-then-maybe-reset semantics.

    ``clock_col`` supplies "now" per event (event time by default).  The
    groupBy shuffles by wallet — state lives with its partition, scaling
    horizontally exactly like adding Goka processor instances."""
    prepared = deposits.withColumn("clock", F.col(clock_col).cast("long"))
    return prepared.groupBy("wallet_id").applyInPandasWithState(
        _make_transition(period_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class DetectorProcessor(StatefulProcessor):
    """The same detector transition on the Spark 4 ``transformWithState``
    API (StatefulProcessor): typed per-key ValueState handles instead of a
    single state tuple — the forward path for custom stateful operators
    (timers, TTL, multiple state variables) that applyInPandasWithState
    cannot express.  Both implementations share ``_replay``; the streaming
    tests assert identical output on identical input.
    """

    def init(self, handle) -> None:
        self._counter = handle.getValueState("counter", STATE_SCHEMA)

    def handleInputRows(self, key: tuple, rows, timerValues) -> Iterator[pd.DataFrame]:
        (wallet_id,) = key
        existing = self._counter.get()
        start, received = (existing[0], existing[1]) if existing is not None else (0, 0.0)
        out: list[tuple] = []
        for pdf in rows:
            emitted, start, received = _replay(wallet_id, pdf, start, received)
            out.extend(emitted)
        self._counter.update((start, received))
        yield pd.DataFrame(out, columns=_OUT_COLS)

    def close(self) -> None:
        pass


def exact_detector_tws(deposits: DataFrame, clock_col: str = "ts") -> DataFrame:
    """``exact_detector`` on the transformWithStateInPandas API (Spark ≥4.0).
    Same semantics, same output schema; state is a named ValueState in the
    RocksDB store, checkpoint-restored like the classic variant."""
    prepared = deposits.withColumn("clock", F.col(clock_col).cast("long"))
    return prepared.groupBy("wallet_id").transformWithStateInPandas(
        statefulProcessor=DetectorProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def exact_detector_batch(
    deposits: DataFrame,
    clock_col: str = "ts",
    period_s: int = ROLLING_PERIOD_SECONDS,
) -> DataFrame:
    """Batch replay of the exact detector: the same per-key transition run
    over the whole history via ``applyInPandas`` — equals the streaming
    operator's cumulative output on the same input (tested), and gives the
    driver a collectable query for the faithful semantics.  ``period_s``
    mirrors the streaming variants' knob so tests can compare the batch
    replay against second-scale (or no-reset) streaming runs."""

    def replay_group(pdf: pd.DataFrame) -> pd.DataFrame:
        wallet_id = pdf["wallet_id"].iloc[0]
        out, _, _ = _replay(wallet_id, pdf, 0, 0.0, period_s)
        return pd.DataFrame(out, columns=_OUT_COLS)

    prepared = deposits.withColumn("clock", F.col(clock_col).cast("long"))
    return prepared.groupBy("wallet_id").applyInPandas(replay_group, OUTPUT_SCHEMA)


#: timer-variant state adds the pending-reset marker set by the expired
#: processing-time timer (consumed, swallow-style, by the next deposit)
TIMER_STATE_SCHEMA = T.StructType(
    [
        T.StructField("rolling_period_start_unix", T.LongType()),
        T.StructField("received", T.DoubleType()),
        T.StructField("pending_reset", T.IntegerType()),
        T.StructField("timer_ms", T.LongType()),
    ]
)


class TimerDetectorProcessor(StatefulProcessor):
    """The detector with the rolling period enforced by a PROCESSING-TIME
    TIMER instead of the lazy gap check — the faithful analog of Goka's
    wall clock (``detector/detector.go:57,59`` reads ``time.Now()``; a
    registered timer at start + period is the push-model equivalent of
    re-reading the clock at the next callback).

    Mechanics: the first deposit of a period sets ``start`` and registers
    a timer at now_processing + period; when the timer fires,
    ``handleExpiredTimer`` marks ``pending_reset`` (it does NOT zero the
    counter — the reference's reset runs inside a deposit callback AFTER
    the add, swallowing that deposit, so the marker defers the reset to
    the next deposit to preserve the quirk bit-for-bit).  The next
    deposit adds, consumes the marker (start = 0, received = 0),
    and the following deposit opens a fresh period + timer.  A consumed
    or superseded timer is deleted so a stale expiry can never mark a
    fresh period.

    Output-equal to ``exact_detector`` whenever timer firings and clock-
    column gaps agree on which deposits open a new period — which is the
    definition of the two clocks measuring the same thing; the streaming
    test pins this equality under a controlled clock (a short period,
    real sleeps between micro-batches, clock column stamped to match).

    ``period_s`` parameterizes the rolling period (default: the
    reference's ROLLING_PERIOD_SECONDS) so tests can run second-scale
    periods instead of sleeping out the production window."""

    def __init__(self, period_s: int = ROLLING_PERIOD_SECONDS) -> None:
        self._period_s = period_s

    def init(self, handle) -> None:
        self._handle = handle
        self._st = handle.getValueState("counter_t", TIMER_STATE_SCHEMA)

    def _get(self) -> tuple[int, float, int, int]:
        existing = self._st.get()
        if existing is None:
            return 0, 0.0, 0, 0
        return existing[0], existing[1], existing[2], existing[3]

    def handleInputRows(self, key: tuple, rows, timerValues) -> Iterator[pd.DataFrame]:
        (wallet_id,) = key
        start, received, pending, timer_ms = self._get()
        out: list[tuple] = []
        for pdf in rows:
            pdf = pdf.sort_values("seq")
            for row in pdf.itertuples(index=False):
                received += float(row.amount)
                if start == 0:
                    start = int(row.clock)
                    if timer_ms:
                        self._handle.deleteTimer(timer_ms)
                    timer_ms = (
                        timerValues.getCurrentProcessingTimeInMs()
                        + self._period_s * 1000
                    )
                    self._handle.registerTimer(timer_ms)
                elif pending:
                    # the timer fired since the period opened: reset, and
                    # (reference quirk) swallow the current deposit too
                    start = 0
                    received = 0.0
                    pending = 0
                    timer_ms = 0
                flagged = received >= MAX_AMOUNT and start != 0
                out.append(
                    (
                        wallet_id,
                        int(row.seq),
                        not flagged,
                        start if flagged else 0,
                        received,
                    )
                )
        self._st.update((start, received, pending, timer_ms))
        yield pd.DataFrame(out, columns=_OUT_COLS)

    def handleExpiredTimer(self, key: tuple, timerValues, expiredTimerInfo):
        start, received, pending, timer_ms = self._get()
        if timer_ms and expiredTimerInfo.getExpiryTimeInMs() >= timer_ms:
            self._st.update((start, received, 1, 0))
        yield from ()

    def close(self) -> None:
        pass


def exact_detector_timer(
    deposits: DataFrame,
    clock_col: str = "ts",
    period_s: int = ROLLING_PERIOD_SECONDS,
) -> DataFrame:
    """``exact_detector`` with the rolling period driven by processing-
    time timers (``TimerDetectorProcessor``) — requires
    ``timeMode="processingTime"`` so the store tracks timers."""
    prepared = deposits.withColumn("clock", F.col(clock_col).cast("long"))
    return prepared.groupBy("wallet_id").transformWithStateInPandas(
        statefulProcessor=TimerDetectorProcessor(period_s),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )
