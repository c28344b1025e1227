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
    wallet_id: str, pdf: pd.DataFrame, start: int, received: float
) -> tuple[list[tuple], int, float]:
    """The literal detector/detector.go:51-71 transition over one key's
    rows in arrival order; returns emitted events + final state."""
    out: list[tuple] = []
    # per-key arrival order (Kafka offset / seq) — Goka guarantees this by
    # processing one callback at a time per partition
    pdf = pdf.sort_values("seq")
    for row in pdf.itertuples(index=False):
        now = int(row.clock)
        received += float(row.amount)
        if start == 0:
            start = now
        elif now - start > ROLLING_PERIOD_SECONDS:
            # reset swallows the current deposit too (add happened first)
            start = 0
            received = 0.0
        flagged = received >= MAX_AMOUNT and start != 0
        out.append(
            (wallet_id, int(row.seq), not flagged, start if flagged else 0, received)
        )
    return out, start, received


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
        emitted, start, received = _replay(wallet_id, pdf, start, received)
        out.extend(emitted)

    state.update((start, received))
    yield pd.DataFrame(out, columns=_OUT_COLS)


def exact_detector(deposits: DataFrame, clock_col: str = "ts") -> DataFrame:
    """deposits(wallet_id, amount, ts, seq) stream → FlagEvent stream with
    the reference's exact add-then-maybe-reset semantics.

    ``clock_col`` supplies "now" per event (event time by default).  The
    groupBy shuffles by wallet — state lives with its partition, scaling
    horizontally exactly like adding Goka processor instances."""
    prepared = deposits.withColumn("clock", F.col(clock_col).cast("long"))
    return prepared.groupBy("wallet_id").applyInPandasWithState(
        _transition,
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


def exact_detector_batch(deposits: DataFrame, clock_col: str = "ts") -> DataFrame:
    """Batch replay of the exact detector: the same per-key transition run
    over the whole history via ``applyInPandas`` — equals the streaming
    operator's cumulative output on the same input (tested), and gives the
    driver a collectable query for the faithful semantics."""

    def replay_group(pdf: pd.DataFrame) -> pd.DataFrame:
        wallet_id = pdf["wallet_id"].iloc[0]
        out, _, _ = _replay(wallet_id, pdf, 0, 0.0)
        return pd.DataFrame(out, columns=_OUT_COLS)

    prepared = deposits.withColumn("clock", F.col(clock_col).cast("long"))
    return prepared.groupBy("wallet_id").applyInPandas(replay_group, OUTPUT_SCHEMA)
