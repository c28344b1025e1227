"""Adversarial-clock property suite for the A3 exact detector (r10
verdict #5): the reference's add-then-maybe-reset quirk
(detector/detector.go:54-62) is most fragile exactly at the 120 s
period edge (> is strict: a gap of EXACTLY period does NOT reset) and
under simultaneous-timestamp bursts (delta 0 never resets, amounts
keep accumulating).

Three independent implementations are driven over hypothesis-generated
sequences hitting those edges:

  1. ``_replay`` — the shared transition both streaming operators and
     the batch replay delegate to (the code under test);
  2. an independent Go-literal model written here, straight off
     detector/detector.go, sharing no code with (1);
  3. the DuckDB recursive-CTE fold — the SAME SQL the registered
     ``exact_detector_replay`` oracle uses (``_exact_detector_sql``
     with a VALUES deposit source), so the fuzzer exercises the
     production oracle, not a test-only twin.

A pinned adversarial sequence then goes through all three SPARK
variants (applyInPandasWithState, transformWithStateInPandas, batch
applyInPandas) end-to-end; the timer variant's controlled-clock
equivalence stays in tests/test_streaming.py (it needs real sleeps).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from depositaja_spark.schemas import MAX_AMOUNT, ROLLING_PERIOD_SECONDS
from depositaja_spark.streaming.detector_state import _replay

PERIOD = ROLLING_PERIOD_SECONDS
BASE = 1_700_000_000

# deltas concentrated on the reset boundary: 0 (simultaneous burst),
# PERIOD-1 / PERIOD (inside: > is strict) / PERIOD+1 (first reset
# tick), and far past; amounts concentrated on the 10_000 threshold.
_DELTAS = st.sampled_from([0, 1, PERIOD - 1, PERIOD, PERIOD + 1, PERIOD + 2, 3 * PERIOD])
_AMOUNTS = st.sampled_from(
    [0.25, 1.0, 4999.5, 5000.0, MAX_AMOUNT - 1.0, float(MAX_AMOUNT), MAX_AMOUNT + 1.0]
)
_WALLETS = st.sampled_from(["w1", "w2"])
_EVENTS = st.lists(st.tuples(_WALLETS, _DELTAS, _AMOUNTS), min_size=1, max_size=40)


def _materialize(events):
    """(wallet, delta, amount) → rows (wallet_id, amount, now, seq) with
    per-wallet cumulative clocks (deltas advance each wallet's own clock,
    so boundary gaps are exact per key, as the state machine sees them)."""
    clocks: dict[str, int] = {}
    rows = []
    for seq, (w, delta, amount) in enumerate(events, start=1):
        clocks[w] = clocks.get(w, BASE) + delta
        rows.append((w, amount, clocks[w], seq))
    return rows


def _go_model(rows):
    """Independent replica of detector/detector.go:47-75, per wallet."""
    state: dict[str, tuple[int, float]] = {}
    out = {}
    for w, amount, now, seq in rows:
        start, received = state.get(w, (0, 0.0))
        received += amount                     # :54  add first
        if start == 0:                         # :56-57
            start = now
        elif now - start > PERIOD:             # :59-62 strict >
            start, received = 0, 0.0           # swallow current deposit
        state[w] = (start, received)
        flagged = received >= MAX_AMOUNT and start != 0
        out[seq] = (w, not flagged, start if flagged else 0, received)
    return out


def _replay_model(rows):
    """Drive the shared ``_replay`` transition one event at a time in
    global seq order with interleaved wallets — exactly the per-callback
    arrival order the streaming operators feed it."""
    import pandas as pd

    state: dict[str, tuple[int, float]] = {}
    out = {}
    for w, amount, now, seq in rows:
        start, received = state.get(w, (0, 0.0))
        pdf = pd.DataFrame({"seq": [seq], "amount": [amount], "clock": [now]})
        emitted, start, received = _replay(w, pdf, start, received)
        state[w] = (start, received)
        ((wid, s, removed, anchor, recv),) = emitted
        out[s] = (wid, removed, anchor, recv)
    return out


def _duckdb_fold(rows):
    """The registered oracle's recursive-CTE fold over a VALUES source."""
    from depositaja_spark.queries_ext import _exact_detector_sql

    values = ", ".join(f"('{w}', {a!r}, {now}, {seq})" for w, a, now, seq in rows)
    sql = _exact_detector_sql(
        f"SELECT * FROM (VALUES {values}) AS t(wallet_id, amount, now, seq)"
    )
    out = {}
    for w, seq, removed, anchor, received in duckdb.connect().execute(sql).fetchall():
        out[seq] = (w, bool(removed), anchor, received)
    return out


@settings(max_examples=80, deadline=None)
@given(_EVENTS)
def test_three_way_fold_equivalence(events):
    rows = _materialize(events)
    want = _go_model(rows)
    assert _replay_model(rows) == want
    assert _duckdb_fold(rows) == want


@settings(max_examples=40, deadline=None)
@given(_EVENTS)
def test_exact_period_gap_three_cycle(events):
    """Metamorphic pin of the strict > at the edge: force every delta to
    exactly PERIOD.  The anchor does NOT advance within a window, so the
    per-wallet pattern is a strict 3-cycle — open (k: received=a_k), add
    (k+1: gap == PERIOD, NO reset — this is the strict >), reset (k+2:
    gap == 2·PERIOD, swallowed to 0) — forever."""
    rows = _materialize([(w, PERIOD, a) for w, _, a in events])
    out = _go_model(rows)
    assert _replay_model(rows) == out
    pos: dict[str, int] = {}
    prev: dict[str, float] = {}
    for seq in sorted(out):
        w, _, _, received = out[seq]
        p = pos.get(w, 0)
        if p % 3 == 2:
            assert received == 0.0          # second exact-gap: reset
        elif p % 3 == 1:
            assert received > prev[w]       # first exact-gap: NO reset
        else:
            assert received > 0.0           # window opens with the add
        pos[w] = p + 1
        prev[w] = received


# pinned adversarial sequence for the end-to-end Spark variants: exact
# edge (PERIOD then PERIOD+1), simultaneous burst crossing the
# threshold, post-reset reopen, and an exact-threshold single deposit
_PINNED = [
    ("w1", 6000.0, BASE, 1),
    ("w1", 4000.0, BASE + PERIOD, 2),          # gap == PERIOD: no reset, flags
    ("w1", 70.0, BASE + 2 * PERIOD + 1, 3),    # gap PERIOD+1: reset swallows
    ("w1", 30.0, BASE + 2 * PERIOD + 2, 4),    # fresh window
    ("w2", 5000.0, BASE, 5),                   # simultaneous burst...
    ("w2", 5000.0, BASE, 6),                   # ...crosses threshold at Δ0
    ("w2", 1.0, BASE, 7),
    ("w3", float(MAX_AMOUNT), BASE + 3, 8),    # exact-threshold single hit
]


def test_spark_variants_agree_on_adversarial_sequence(spark, tmp_path):
    """applyInPandasWithState == transformWithStateInPandas == batch
    replay == the Go-literal model, on the pinned edge sequence."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from depositaja_spark.streaming.detector_state import (
        exact_detector,
        exact_detector_batch,
        exact_detector_tws,
    )

    schema = T.StructType(
        [
            T.StructField("wallet_id", T.StringType()),
            T.StructField("amount", T.DoubleType()),
            T.StructField("ts", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    src = tmp_path / "adv"
    src.mkdir()
    # ONE parquet file — the file stream does not recurse into the
    # directories DataFrame.write.parquet produces
    pq.write_table(
        pa.table(
            {
                "wallet_id": pa.array([r[0] for r in _PINNED], pa.string()),
                "amount": pa.array([r[1] for r in _PINNED], pa.float64()),
                "ts": pa.array([r[2] for r in _PINNED], pa.int64()),
                "seq": pa.array([r[3] for r in _PINNED], pa.int64()),
            }
        ),
        str(src / "b0.parquet"),
    )

    want = {
        seq: (w, removed, anchor, round(recv, 4))
        for seq, (w, removed, anchor, recv) in _go_model(
            [(w, a, ts, s) for w, a, ts, s in _PINNED]
        ).items()
    }

    def collect_stream(make_out, name):
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            make_out(stream)
            .writeStream.queryName(name)
            .format("memory")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.seq: (
                r.wallet_id,
                r.flag_removed,
                r.rolling_period_start_unix,
                round(r.received, 4),
            )
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    assert collect_stream(exact_detector, "adv_classic") == want
    # the TWS runtime talks to its state server over protobuf; gate like
    # tests/test_streaming.py::test_exact_detector_tws_equals_classic
    try:
        import google.protobuf  # noqa: F401

        assert collect_stream(exact_detector_tws, "adv_tws") == want
    except ImportError:
        pass
    batch = spark.read.parquet(str(src / "b0.parquet"))
    got_batch = {
        r.seq: (
            r.wallet_id,
            r.flag_removed,
            r.rolling_period_start_unix,
            round(r.received, 4),
        )
        for r in exact_detector_batch(batch).collect()
    }
    assert got_batch == want
