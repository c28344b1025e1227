"""CDC fold + MERGE: branch coverage the fixture oracle can't pin
(tombstone deletes, resurrections, snapshot carries) plus the
associativity property the registered oracle relies on."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from depositaja_spark.functions.cdc import changelog_merge, changelog_state

B = dt.datetime(2024, 5, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, B + dt.timedelta(minutes=m), u, op, v) for i, (m, u, op, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )


def _state(spark, rows):
    """Pure-Python last-write-wins fold (minutes are unique per user in
    these fixtures, so order is unambiguous)."""
    last: dict = {}
    for m, u, op, v in rows:
        if u not in last or m > last[u][0]:
            last[u] = (m, op, v)
    return {
        u: (v, int((B + dt.timedelta(minutes=m)).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000))
        for u, (m, op, v) in last.items()
        if op != "error"
    }


ROWS = [
    (0, 1, "purchase", 10.0),   # u1: upserted pre, deleted post -> gone
    (70, 1, "error", 0.0),
    (5, 2, "purchase", 20.0),   # u2: quiet post-cutoff -> snapshot carry
    (10, 3, "error", 0.0),      # u3: dead in snapshot, resurrected post
    (80, 3, "purchase", 33.0),
    (15, 4, "purchase", 40.0),  # u4: updated post -> delta value wins
    (90, 4, "click", 44.0),
    (95, 5, "purchase", 55.0),  # u5: born post-cutoff (insert)
    (20, 6, "error", 0.0),      # u6: dead in snapshot, no delta -> absent
]
CUT_MIN = 60


def test_merge_branches(spark):
    ev = _ev(spark, ROWS)
    us = F.unix_micros(F.col("ts"))
    cut_us = int((B + dt.timedelta(minutes=CUT_MIN)).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    snapshot = (
        changelog_state(ev.filter(us < cut_us))
        .filter(F.col("op") != "error")
        .select("user_id", "last_value", "last_ts_us")
    )
    delta = changelog_state(ev.filter(us >= cut_us))
    got = {r.user_id: (r.last_value, r.last_ts_us, r.src)
           for r in changelog_merge(snapshot, delta).collect()}
    want_vals = _state(spark, ROWS)
    assert set(got) == set(want_vals) == {2, 3, 4, 5}
    for u, (v, ts) in want_vals.items():
        assert got[u][:2] == (v, ts), u
    assert got[2][2] == "snapshot"
    assert {got[3][2], got[4][2], got[5][2]} == {"delta"}


def test_merge_associativity_any_cutoff(spark):
    """fold(all) == merge(fold(pre), fold(post)) at EVERY cutoff — the
    property the registered query's one-pass oracle relies on."""
    ev = _ev(spark, ROWS)
    us = F.unix_micros(F.col("ts"))
    want = {
        r.user_id: (r.last_value, r.last_ts_us)
        for r in changelog_state(ev).filter(F.col("op") != "error")
        .select("user_id", "last_value", "last_ts_us").collect()
    }
    for cut_min in (0, 8, 40, 75, 200):
        cut_us = int((B + dt.timedelta(minutes=cut_min)).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        snapshot = (
            changelog_state(ev.filter(us < cut_us))
            .filter(F.col("op") != "error")
            .select("user_id", "last_value", "last_ts_us")
        )
        delta = changelog_state(ev.filter(us >= cut_us))
        got = {r.user_id: (r.last_value, r.last_ts_us)
               for r in changelog_merge(snapshot, delta).collect()}
        assert got == want, cut_min


def test_tie_break_same_ts(spark):
    """Duplicate timestamps fold by the event_id tie-break."""
    rows = [(1, 9, "purchase", 1.0), (1, 9, "purchase", 2.0)]
    ev = spark.createDataFrame(
        [(i, B, u, op, v) for i, (m, u, op, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = changelog_state(ev).collect()
    assert len(out) == 1 and out[0].last_value == 2.0
