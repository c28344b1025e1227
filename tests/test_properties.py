"""Property-based tests (SURVEY.md §5.4) with hypothesis.

The key one is detector parity: the engine's exact stateful detector must
agree with an independent pure-Python simulation of the reference's
transition (detector/detector.go:51-71) on arbitrary deposit sequences —
including adversarial timing around the 120-second boundary.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from depositaja_spark.operators import (
    balance_per_wallet,
    deposit_history,
    latest_flag,
    valid_deposits,
)
from depositaja_spark.schemas import MAX_AMOUNT, ROLLING_PERIOD_SECONDS

BASE_TS = 1_600_000_000

# a deposit sequence: per-event (wallet ∈ 3, amount, gap seconds)
deposit_seqs = st.lists(
    st.tuples(
        st.sampled_from(["wa", "wb", "wc"]),
        st.floats(min_value=-100.0, max_value=9000.0, allow_nan=False, width=32),
        st.integers(min_value=0, max_value=200),
    ),
    min_size=1,
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def to_rows(seq):
    """(wallet, amount, gap) → DEPOSIT-shaped rows with cumulative ts."""
    t = BASE_TS
    rows = []
    for i, (w, amt, gap) in enumerate(seq):
        t += gap
        rows.append((w, float(round(amt, 2)), t, i + 1))
    return rows


def make_df(spark, rows):
    return spark.createDataFrame(
        [(w, a, s, q) for (w, a, s, q) in rows],
        "wallet_id string, amount double, clock_s long, seq long",
    ).select(
        "wallet_id", "amount", F.timestamp_seconds("clock_s").alias("ts"), "seq"
    )


@given(deposit_seqs)
@SETTINGS
def test_balance_matches_python_fold(spark, seq):
    rows = to_rows(seq)
    got = {
        r.wallet_id: r.balance
        for r in balance_per_wallet(valid_deposits(make_df(spark, rows))).collect()
    }
    want: dict = defaultdict(float)
    for w, a, _, _ in rows:
        if a > 0:
            want[w] += a
    assert set(got) == set(want)
    for w in want:
        assert got[w] == pytest.approx(want[w], abs=1e-9)


@given(deposit_seqs)
@SETTINGS
def test_history_length_and_order(spark, seq):
    rows = to_rows(seq)
    hist = {
        r.wallet_id: [d["amount"] for d in r.deposits]
        for r in deposit_history(valid_deposits(make_df(spark, rows))).collect()
    }
    want: dict = defaultdict(list)
    for w, a, _, _ in rows:
        if a > 0:
            want[w].append(a)
    assert {k: v for k, v in hist.items()} == dict(want)


@given(deposit_seqs)
@SETTINGS
def test_exact_detector_matches_reference_simulation(spark, seq):
    """Engine replay vs an independent simulation of
    detector/detector.go:51-71 (add → maybe-reset-swallowing-current →
    flag-on-every-event)."""
    from depositaja_spark.streaming.detector_state import exact_detector_batch

    rows = [r for r in to_rows(seq) if r[1] > 0]
    if not rows:
        return
    got = {
        r.seq: (r.flag_removed, r.rolling_period_start_unix, round(r.received, 4))
        for r in exact_detector_batch(make_df(spark, rows)).collect()
    }

    state: dict = {}
    want = {}
    for w, amt, now, seqno in rows:  # already in global seq order
        start, received = state.get(w, (0, 0.0))
        received += amt
        if start == 0:
            start = now
        elif now - start > ROLLING_PERIOD_SECONDS:
            start, received = 0, 0.0
        flagged = received >= MAX_AMOUNT and start != 0
        state[w] = (start, received)
        want[seqno] = (not flagged, start if flagged else 0, round(received, 4))
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["wa", "wb"]),
            st.booleans(),
            st.integers(min_value=0, max_value=10**6),
        ),
        min_size=1,
        max_size=20,
    )
)
@SETTINGS
def test_latest_flag_is_last_event_per_key(spark, events):
    """A4 fold == python fold by max seq (ties impossible: seq unique)."""
    rows = [
        (w, removed, 0 if removed else start, i + 1)
        for i, (w, removed, start) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "wallet_id string, flag_removed boolean, rolling_period_start_unix long, seq long",
    )
    got = {
        r.wallet_id: (r.flagged, r.rolling_period_start_unix)
        for r in latest_flag(df).collect()
    }
    last: dict = {}
    for w, removed, start, seqno in rows:
        last[w] = (not removed, 0 if removed else start)
    assert got == last


def test_exact_sum_invariant_under_repartition(spark):
    """The DECIMAL money-sum convention is partitioning-independent: the
    same rows summed under 1, 7, and 32 partitions produce bit-identical
    doubles (the property AQE re-planning / retries rely on)."""
    from depositaja_spark.functions.numeric import dec, exact_sum
    from depositaja_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    expr = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    vals = {
        n: li.repartition(n).agg(exact_sum(expr).alias("s")).collect()[0].s
        for n in (1, 7, 32)
    }
    assert len(set(vals.values())) == 1, vals


def test_zipf_fit_matches_numpy_polyfit(spark):
    """The distributed closed-form OLS equals an independent numpy
    polyfit over the same (log-rank, log-freq) points."""
    import math

    import numpy as np

    from depositaja_spark import registry

    row = registry.QUERIES["zipf_law_fit"](spark, "/root/testdata/sf0.001").collect()[0]
    # rebuild the exact points the query ranks
    from depositaja_spark.functions import text as tx
    from depositaja_spark.queries_ext import _docs

    freq = (
        _docs(spark, "/root/testdata/sf0.001")
        .select(F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("tok")
        .count()
        .orderBy(F.desc("count"), F.asc("tok"))
        .limit(1000)
        .collect()
    )
    y = np.array([math.log10(r["count"]) for r in freq])
    x = np.log10(np.arange(1, len(freq) + 1, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(row.slope - slope) < 1e-4
    assert abs(row.intercept - intercept) < 1e-4
    assert row.n_terms == len(freq)


def test_value_hashes_stable_across_shuffle_partition_counts(spark):
    """Driver-config drift guard: a sample of value-sensitive queries
    (money sums, double divisions, window ranks, near-dup scores) must
    produce identical sorted results when spark.sql.shuffle.partitions
    changes — the determinism conventions (exact DECIMAL, rounding,
    total-order tie-breaks) are what make this hold."""
    from depositaja_spark import registry

    sample = [
        "tpch_q1",
        "revenue_by_nation",
        "nation_market_share",
        "top_supplier_revenue",
        "jaccard_near_dups",
        "zipf_law_fit",
        "source_epoch_plan",
    ]
    sf = "/root/testdata/sf0.001"

    def snapshot():
        out = {}
        for name in sample:
            df = registry.QUERIES[name](spark, sf)
            out[name] = sorted(tuple(r) for r in df.collect())
        return out

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    base = snapshot()
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = snapshot()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    for name in sample:
        assert base[name] == alt[name], name


# --- substring spans: random-corpus parity vs an independent replica ---------

_span_corpora = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=24
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


def _py_dup_spans(texts: dict[int, str], n: int) -> set[tuple[int, int, int]]:
    grams: dict[str, set[int]] = {}
    toks = {d: t.split(" ") for d, t in texts.items()}
    for d, tk in toks.items():
        for i in range(len(tk) - n + 1):
            grams.setdefault(" ".join(tk[i : i + n]), set()).add(d)
    out = set()
    for d, tk in toks.items():
        ps = [
            i
            for i in range(len(tk) - n + 1)
            if len(grams[" ".join(tk[i : i + n])]) >= 2
        ]
        if not ps:
            continue
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > n:
                out.add((d, start, prev + n))
                start = p
            prev = p
        out.add((d, start, prev + n))
    return out


@given(_span_corpora)
@SETTINGS
def test_duplicate_spans_match_replica_on_random_corpora(spark, texts):
    """Tiny 4-letter vocabulary forces heavy cross-doc gram collisions —
    the worst case for the merge logic."""
    from depositaja_spark.functions.spans import duplicate_spans

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    n = 3
    want = _py_dup_spans(dict(enumerate(texts)), n)
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(docs, n=n).collect()
    }
    assert got == want


@given(_span_corpora)
@SETTINGS
def test_clip_accounting_on_random_corpora(spark, texts):
    """kept + covered == total tokens for every doc, on adversarially
    collision-heavy corpora."""
    from depositaja_spark.functions.spans import clip_duplicate_spans, duplicate_spans

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    n = 3
    total = {d: len(t.split(" ")) for d, t in enumerate(texts)}
    covered: dict[int, int] = {}
    for r in duplicate_spans(docs, n=n).collect():
        covered[r.doc_id] = covered.get(r.doc_id, 0) + (r.span_end - r.span_start)
    kept = {r.doc_id: r.n_kept for r in clip_duplicate_spans(docs, n=n).collect()}
    for d, tot in total.items():
        assert kept.get(d, 0) + covered.get(d, 0) == tot
