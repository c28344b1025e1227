"""Round-9 query families: planted-input / pure-Python-replay tests for
retrieval evaluation, survival analysis, multi-rater agreement, Brier
decomposition, BFS layers, profiling, and deterministic weighted
sampling.  The DuckDB oracle differential (tests/test_oracle.py) checks
these on the fixtures; here the referee is an independent replay on
inputs chosen to exercise the edge cases the fixtures don't."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from depositaja_spark import registry


# --- helpers -----------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, epoch_s, user_id, event_type, value)."""
    df = spark.createDataFrame(
        [
            (eid, ts, uid, et, val, None)
            for (eid, ts, uid, et, val) in rows
        ],
        "event_id long, _e long, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("_e")).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


# --- Kaplan-Meier ------------------------------------------------------------


def _surv_user(rows, eid, uid, d0, d_end, converts):
    """One planted user: first event (view) at d0; then either a
    qualifying purchase (value 200 >= the cut) at d_end, or a final
    view at d_end (censored).  Returns the next event id."""
    day = 86400
    rows.append((eid, d0 * day, uid, "view", 1.0))
    eid += 1
    rows.append(
        (eid, d_end * day, uid, "purchase" if converts else "view",
         200.0 if converts else 1.0)
    )
    return eid + 1


def test_kaplan_meier_planted_replay(spark, tmp_path):
    """Planted time-to-conversion with censoring: three users convert
    (qualifying purchase) at durations 2, 2, 5; three never convert and
    are censored at durations 5, 0, 1.  Replayed with the textbook
    product-limit estimator."""
    rows = []
    eid = 0
    eid = _surv_user(rows, eid, 1, 10, 12, True)    # dur 2, converted
    eid = _surv_user(rows, eid, 2, 20, 22, True)    # dur 2, converted
    eid = _surv_user(rows, eid, 3, 30, 35, True)    # dur 5, converted
    eid = _surv_user(rows, eid, 4, 94, 99, False)   # dur 5, censored
    rows.append((eid, 100 * 86400, 5, "view", 1.0))  # dur 0, censored
    eid += 1
    eid = _surv_user(rows, eid, 6, 98, 99, False)   # dur 1, censored
    d = _write_events(spark, tmp_path, rows)

    got = {
        r.t_days: (r.n_risk, r.n_converted, r.survival)
        for r in registry.QUERIES["kaplan_meier_conversion"](spark, d).collect()
    }
    # replay: durations (dur, conv): (2,1)(2,1)(5,1)(5,0)(0,0)(1,0)
    # event times: 2 (n=4: durs >=2 are 2,2,5,5; d=2), 5 (n=2, d=1)
    s2 = (4 - 2) / 4
    s5 = s2 * (2 - 1) / 2
    assert set(got) == {2, 5}
    assert got[2] == (4, 2, round(s2, 6))
    assert got[5] == (2, 1, round(s5, 6))


def test_kaplan_meier_zero_latch(spark, tmp_path):
    """When every remaining at-risk user converts at the last event
    time, S must be exactly 0.0 (the latch), not exp(-inf)/NULL."""
    rows = []
    eid = 0
    for uid, (d0, dc) in enumerate([(0, 3), (0, 3), (5, 8)]):
        eid = _surv_user(rows, eid, uid, d0, dc, True)  # all dur 3, converted
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.t_days: r.survival
        for r in registry.QUERIES["kaplan_meier_conversion"](spark, d).collect()
    }
    # every user converts at duration 3; the risk set empties there
    assert got == {3: 0.0}


# --- retrieval eval ----------------------------------------------------------


def test_retrieval_eval_replay_on_fixture(spark):
    """Replay NDCG/MRR/recall from the ranked list itself (via
    cosine_topk + labels collected once), using the same literal
    discount table — checks the metric algebra, not the ranking."""
    from depositaja_spark.functions import similarity as sim
    from depositaja_spark.queries_ext import (
        _DCG_DISCOUNTS,
        _EVAL_K,
        _IDCG_PREFIX,
    )

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id").isin(sim.QUERY_IDS))
    ranked = sim.cosine_topk(emb, queries, k=_EVAL_K).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    n_lab = {}
    for v in labels.values():
        n_lab[v] = n_lab.get(v, 0) + 1

    got = {
        r.query_id: r
        for r in registry.QUERIES["retrieval_eval_at_k"](spark, sf).collect()
    }
    for qid in sim.QUERY_IDS:
        rows = sorted((r for r in ranked if r.query_id == qid), key=lambda r: r.rank)
        rel = [labels[r.cand_id] == labels[qid] for r in rows]
        hits = sum(rel)
        n_rel = n_lab[labels[qid]] - 1
        dcg = 0.0
        for i, rl in enumerate(rel):
            dcg += _DCG_DISCOUNTS[i] if rl else 0.0
        idcg = _IDCG_PREFIX[min(n_rel, _EVAL_K) - 1]
        rr = next((1.0 / (i + 1) for i, rl in enumerate(rel) if rl), 0.0)
        g = got[qid]
        assert g.n_rel == n_rel
        assert g.hits_at_k == hits
        assert g.recall_at_k == round(hits / n_rel, 6)
        assert g.precision_at_k == round(hits / _EVAL_K, 6)
        assert g.rr == round(rr, 6)
        assert g.ndcg_at_k == round(dcg / idcg, 6)
        assert 0.0 <= g.ndcg_at_k <= 1.0


def test_retrieval_eval_unique_label_null_not_crash(spark, tmp_path):
    """ADVICE r9: a query whose label is UNIQUE in the corpus has
    n_rel = 0 — element_at(idcg, 0) raises under ANSI and hits/0
    diverges across engines.  Plant exactly that degenerate corpus and
    require BOTH engines to answer NULL recall/ndcg (not crash, not
    diverge) while the bounded metrics stay defined."""
    import duckdb
    import pandas as pd

    from depositaja_spark import registry
    from tests.oracle_harness import compare

    rows = [
        (i, [float((i * 7 + j * 3) % 11 + 1) for j in range(8)],
         999 if i == 0 else (1 if i % 2 else 2))
        for i in range(20)
    ]
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    got = registry.QUERIES["retrieval_eval_at_k"](spark, str(tmp_path)).collect()
    by_q = {r.query_id: r for r in got}
    assert by_q[0].n_rel == 0
    assert by_q[0].recall_at_k is None and by_q[0].ndcg_at_k is None
    assert by_q[0].rr == 0.0 and by_q[0].precision_at_k == 0.0
    assert by_q[1].n_rel > 0 and by_q[1].ndcg_at_k is not None
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'"
    )
    compare(
        registry.QUERIES["retrieval_eval_at_k"](spark, str(tmp_path)),
        con,
        registry.ORACLES["retrieval_eval_at_k"],
    )


# --- Fleiss kappa ------------------------------------------------------------


def test_fleiss_kappa_replay_on_fixture(spark):
    """Pure-Python Fleiss' kappa from the collected vote matrix equals
    the registered query (and the pairwise-kappa queries' vote
    construction is shared, so the panel is the same one)."""
    from depositaja_spark.queries_curate import _KAPPA_LFS, q_weak_label_votes

    sf = "/root/testdata/sf0.001"
    votes = q_weak_label_votes(spark, sf).select("doc_id", *_KAPPA_LFS).collect()
    m = len(_KAPPA_LFS)
    n = len(votes)
    s2 = 0
    cj: dict = {}
    for r in votes:
        counts: dict = {}
        for lf in _KAPPA_LFS:
            v = r[lf]
            counts[v] = counts.get(v, 0) + 1
            cj[v] = cj.get(v, 0) + 1
        s2 += sum(c * c for c in counts.values())
    p_bar = (s2 - n * m) / (n * m * (m - 1))
    p_e = sum(c * c for c in cj.values()) / (n * m) ** 2
    kappa = (p_bar - p_e) / (1 - p_e)

    (row,) = registry.QUERIES["fleiss_kappa_panel"](spark, sf).collect()
    assert row.n_items == n and row.n_raters == m
    assert row.p_bar == round(p_bar, 6)
    assert row.p_e == round(p_e, 6)
    assert row.fleiss_kappa == round(kappa, 6)


def test_fleiss_kappa_perfect_agreement(spark, tmp_path):
    """Sanity anchor: a panel that always agrees has kappa = 1 — built
    by replaying the metric on a degenerate planted matrix."""
    # replay-only check of the formula's fixed point (the query runs on
    # documents; here we pin the algebra the query implements)
    n, m = 10, 5
    s2 = n * m * m  # every item: one category × m raters
    p_bar = (s2 - n * m) / (n * m * (m - 1))
    assert p_bar == 1.0


# --- Brier -------------------------------------------------------------------


def test_brier_decomposition_identity_and_replay(spark, tmp_path):
    """Murphy identity Brier = REL − RES + UNC holds to float tolerance,
    and every component matches a pure-Python replay on planted events
    (including an empty bin range and a single-outcome bin)."""
    from depositaja_spark.functions.text import py_hash64
    from depositaja_spark.queries_ml import _BRIER_SALT

    rows = [
        (i, 1000 + i, i % 7, "purchase" if i % 3 == 0 else "view", 1.0)
        for i in range(200)
    ]
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["brier_decomposition"](spark, d).collect()

    recs = []
    for i, _, _, et, _ in rows:
        p = py_hash64(f"{_BRIER_SALT}{i}") % 101
        y = 1 if et == "purchase" else 0
        recs.append((p, p, y))
    n = len(recs)
    yy = sum(y for _, _, y in recs)
    brier = sum((p - 100 * y) ** 2 for _, p, y in recs) / (n * 10000.0)
    bins: dict = {}
    for b, p, y in recs:
        nb, ps, ys = bins.get(b, (0, 0, 0))
        bins[b] = (nb + 1, ps + p, ys + y)
    rel = sum(
        (ps - 100 * ys) ** 2 / (nb * 10000.0) for nb, ps, ys in bins.values()
    ) / n
    res = sum(
        (ys * n - yy * nb) ** 2 / (nb * n * n) for nb, ps, ys in bins.values()
    ) / n
    unc = yy * (n - yy) / (n * n)
    assert got.n_events == n
    assert abs(got.brier - brier) < 1e-6
    assert abs(got.reliability - rel) < 1e-6
    assert abs(got.resolution - res) < 1e-6
    assert abs(got.uncertainty - unc) < 1e-6
    assert abs(got.brier - (got.reliability - got.resolution + got.uncertainty)) < 2e-6


# --- BFS ---------------------------------------------------------------------


def test_bfs_hops_golden_graph(spark):
    """Chain with a branch and a disconnected island: exact hop levels,
    island unreached, early-exit does not truncate levels."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5), (5, 6), (8, 9)], "u long, v long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(edges, seeds, max_hops=6).collect()}
    release_caches()
    assert got == {1: 0, 2: 1, 3: 2, 5: 2, 4: 3, 6: 3}


def test_bfs_hops_bound_respected(spark):
    """max_hops truncates: a 5-chain walked with max_hops=2 reaches
    exactly hops {0,1,2}."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.graph import bfs_hops

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "u long, v long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    release_caches()
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_oracle_empty_graph_yields_empty(spark):
    """ADVICE r9: an aggregate seed (min(u)) over an EMPTY edge set still
    produces one NULL row — the oracle must drop it so both engines
    answer an empty frame on an empty graph."""
    import duckdb

    from depositaja_spark.functions.graph import bfs_oracle_sql

    sql = bfs_oracle_sql(
        "SELECT * FROM (VALUES (1, 2)) t(u, v) WHERE false",
        "SELECT min(u) AS node FROM e WHERE u IS NOT NULL",
        max_hops=3,
    )
    assert duckdb.connect().execute(sql).fetchall() == []


# --- profiling / sampling / rolling actives ----------------------------------


def test_orders_pk_audit_planted_dupes(spark, tmp_path):
    rows = [(1,), (2,), (2,), (3,), (3,), (3,)]
    spark.createDataFrame(rows, "o_orderkey long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/orders.parquet")
    (r,) = registry.QUERIES["orders_pk_audit"](spark, str(tmp_path)).collect()
    assert (r.n_rows, r.n_keys, r.n_dup_keys, r.max_multiplicity) == (6, 3, 2, 3)


def test_events_profile_planted(spark, tmp_path):
    rows = [
        (1, 100, 1, "a", 1.0),
        (2, 100, 1, "a", None),
        (3, 200, 2, "b", 2.0),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.col_name: (r.n_rows, r.n_null, r.n_distinct)
        for r in registry.QUERIES["events_profile"](spark, d).collect()
    }
    assert got["event_id"] == (3, 0, 3)
    assert got["user_id"] == (3, 0, 2)
    assert got["value"] == (3, 1, 2)
    assert got["props"] == (3, 3, 0)


def test_weighted_sample_deterministic_and_correct(spark, tmp_path):
    """The sample equals the Python replay of ln(u)/w ranking and is
    identical across two runs (no RNG state anywhere)."""
    from depositaja_spark.functions.text import py_hash64
    from depositaja_spark.queries_olap import _WS_K, _WS_MOD, _WS_SALT

    rows = [(i, 1000 + i, 1, "view", float(1 + i % 9)) for i in range(300)]
    d = _write_events(spark, tmp_path, rows)
    want = sorted(
        (
            (
                math.log(
                    (py_hash64(f"{_WS_SALT}{i}") % _WS_MOD + 1) / float(_WS_MOD + 1)
                )
                / w,
                i,
            )
            for i, _, _, _, w in [(r[0], 0, 0, 0, r[4]) for r in rows]
        ),
        key=lambda t: (-t[0], t[1]),
    )[:_WS_K]
    got1 = [
        (r.event_id, r.rank)
        for r in registry.QUERIES["weighted_sample_topk"](spark, d).collect()
    ]
    got2 = [
        (r.event_id, r.rank)
        for r in registry.QUERIES["weighted_sample_topk"](spark, d).collect()
    ]
    assert got1 == got2
    assert [e for e, _ in sorted(got1, key=lambda t: t[1])] == [
        i for _, i in want
    ]


def test_rolling_7d_active_users_planted(spark, tmp_path):
    """3 users: membership windows overlap correctly and tail days past
    the corpus end are not emitted."""
    day = 86400
    rows = [
        (1, 0 * day, 1, "view", 1.0),
        (2, 3 * day, 2, "view", 1.0),
        (3, 10 * day, 3, "view", 1.0),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.day: r.active_7d
        for r in registry.QUERIES["rolling_7d_active_users"](spark, d).collect()
    }
    want = {}
    for d0 in (0, 3, 10):
        for c in range(d0, d0 + 7):
            if c <= 10:
                want[c] = want.get(c, 0) + 1
    assert got == want


# --- ANOVA / Nelson-Aalen / Heaps --------------------------------------------


def test_anova_planted_replay(spark, tmp_path):
    """Three planted groups with known within/between structure; exact
    sums-of-squares replayed in Python (and η² ∈ [0, 1])."""
    vals = {"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0], "c": [10.0]}
    rows, eid = [], 0
    for et, vs in vals.items():
        for v in vs:
            rows.append((eid, 1000 + eid, 1, et, v))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["anova_value_by_type"](spark, d).collect()

    all_v = [v for vs in vals.values() for v in vs]
    n, k = len(all_v), len(vals)
    grand = sum(all_v) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2 for vs in vals.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in vals.values() for v in vs)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got.n_groups == k and got.n_events == n
    # ss_* are rounded to 4 decimals in the query output
    assert abs(got.ss_between - ssb) < 1e-4
    assert abs(got.ss_within - ssw) < 1e-4
    assert abs(got.f_stat - f) < 1e-4
    assert 0.0 <= got.eta_sq <= 1.0


def test_nelson_aalen_planted_replay(spark, tmp_path):
    """Same censored time-to-conversion cohort as the KM planted test;
    H(t) = Σ d/n replayed exactly."""
    rows, eid = [], 0
    eid = _surv_user(rows, eid, 1, 10, 12, True)    # dur 2, converted
    eid = _surv_user(rows, eid, 2, 20, 22, True)    # dur 2, converted
    eid = _surv_user(rows, eid, 3, 30, 35, True)    # dur 5, converted
    eid = _surv_user(rows, eid, 4, 94, 99, False)   # dur 5, censored
    rows.append((eid, 100 * 86400, 5, "view", 1.0))  # dur 0, censored
    eid += 1
    eid = _surv_user(rows, eid, 6, 98, 99, False)   # dur 1, censored
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.t_days: (r.n_risk, r.n_converted, r.cum_hazard)
        for r in registry.QUERIES["nelson_aalen_conversion"](spark, d).collect()
    }
    h2 = 2 / 4
    h5 = h2 + 1 / 2
    assert got == {2: (4, 2, round(h2, 6)), 5: (2, 1, round(h5, 6))}


def test_vocab_growth_planted_replay(spark, tmp_path):
    """Three tiny documents with overlapping vocabulary: cumulative
    token and vocabulary counts replayed exactly (exact integers)."""
    docs = [(0, "a b a"), (1, "b c"), (2, "c d d")]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r.doc_id: (r.cum_tokens, r.cum_vocab)
        for r in registry.QUERIES["vocab_growth_heaps"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {0: (3, 2), 1: (5, 3), 2: (8, 4)}


# --- wave 4: calibration curve / PMI / novelty -------------------------------


def test_calibration_curve_planted_replay(spark, tmp_path):
    from depositaja_spark.functions.text import py_hash64
    from depositaja_spark.queries_ml import _BRIER_SALT

    rows = [
        (i, 1000 + i, 1, "purchase" if i % 4 == 0 else "view", 1.0)
        for i in range(120)
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.bin: (r.n, r.avg_pred, r.frac_pos)
        for r in registry.QUERIES["calibration_curve"](spark, d).collect()
    }
    bins: dict = {}
    for i, _, _, et, _ in rows:
        p = py_hash64(f"{_BRIER_SALT}{i}") % 101
        y = 1 if et == "purchase" else 0
        b = min(p // 10, 9)
        n, ps, ys = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, ps + p, ys + y)
    want = {
        b: (n, round(ps / (n * 100), 6), round(ys / n, 6))
        for b, (n, ps, ys) in bins.items()
    }
    assert got == want


def test_token_pmi_planted_replay(spark, tmp_path):
    """Four tiny docs with engineered co-occurrence: PMI positive for
    tokens that always co-occur, negative for those that avoid each
    other — replayed exactly (min-co lowered via planted frequencies
    means we check only pairs above the shipped threshold)."""
    import math

    from depositaja_spark.queries_ml import _PMI_MIN_CO, _PMI_V

    # "a b" always together (6 docs), "c" alone in 6 docs, everything
    # shares filler token "x" so co >= threshold for (a,b) and (a|b, x)
    texts = ["a b x"] * 6 + ["c x"] * 6
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        (r.tok_a, r.tok_b): (r.df_a, r.df_b, r.co, r.pmi)
        for r in registry.QUERIES["token_pmi_topv"](spark, str(tmp_path)).collect()
    }
    n = len(texts)
    # df: a=6 b=6 c=6 x=12; pairs with co>=5: (a,b) co=6, (a,x) 6, (b,x) 6, (c,x) 6
    def pmi(co, da, db):
        return round(math.log(co * n / (da * db)), 6)

    assert got == {
        ("a", "b"): (6, 6, 6, pmi(6, 6, 6)),
        ("a", "x"): (6, 12, 6, pmi(6, 6, 12)),
        ("b", "x"): (6, 12, 6, pmi(6, 6, 12)),
        ("c", "x"): (6, 12, 6, pmi(6, 6, 12)),
    }
    # always-together pair carries positive association; the shared
    # filler pairs are exactly independence (co·n = df_a·df_b → pmi 0)
    assert got[("a", "b")][3] > 0
    assert got[("a", "x")][3] == 0.0


def test_doc_ngram_novelty_planted_replay(spark, tmp_path):
    """Doc 0 all-novel, doc 1 fully recycled from doc 0, doc 2 mixed."""
    texts = [
        "a b c d",      # grams: abc, bcd — both novel
        "a b c d",      # same grams — novelty 0
        "a b c e f",    # grams: abc (old), bce, cef — 2/3 novel
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty)
        for r in registry.QUERIES["doc_ngram_novelty"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        0: (2, 2, 1.0),
        1: (2, 0, 0.0),
        2: (3, 2, round(2 / 3, 6)),
    }


# --- wave 5: time-decay value / behavioral entropy ---------------------------


def test_user_value_time_decay_planted_replay(spark, tmp_path):
    import math

    from depositaja_spark.queries_olap import _DECAY_LAMBDA

    day = 86400
    rows = [
        (0, 0 * day, 1, "purchase", 100.0),   # age 10
        (1, 5 * day, 1, "purchase", 100.0),   # age 5
        (2, 10 * day, 1, "purchase", 100.0),  # age 0
        (3, 10 * day, 2, "purchase", 50.0),   # age 0
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.user_id: (r.n_events, r.decayed_value)
        for r in registry.QUERIES["user_value_time_decay"](spark, d).collect()
    }
    u1 = 100.0 * math.exp(-_DECAY_LAMBDA * 10)
    u1 += 100.0 * math.exp(-_DECAY_LAMBDA * 5)
    u1 += 100.0 * math.exp(-_DECAY_LAMBDA * 0)
    assert got[1] == (3, round(u1, 6))
    assert got[2] == (1, 50.0)
    # recency dominance: the same total raw value scores higher when
    # recent — user 1's decayed value is strictly below 300
    assert got[1][1] < 300.0


def test_user_event_entropy_planted_replay(spark, tmp_path):
    import math

    rows = [
        (0, 1000, 1, "view", 1.0),
        (1, 1001, 1, "view", 1.0),
        (2, 1002, 1, "click", 1.0),
        (3, 1003, 1, "purchase", 1.0),
        (4, 1004, 2, "view", 1.0),
        (5, 1005, 2, "view", 1.0),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r.user_id: (r.n_events, r.n_types, r.entropy)
        for r in registry.QUERIES["user_event_entropy"](spark, d).collect()
    }
    # user 1: counts (2,1,1)/4 → H = ln4 - (2ln2)/4
    h1 = math.log(4) - (2 * math.log(2)) / 4
    assert got[1] == (4, 3, round(h1, 6))
    # single-type user: entropy exactly 0
    assert got[2] == (2, 1, 0.0)


# --- log-rank test -------------------------------------------------------------


def _engage(rows, eid, uid, d0):
    """Give a user two EXTRA first-day events so their day-one count
    reaches the engaged-cohort threshold (3)."""
    day = 86400
    for k in range(2):
        rows.append((eid, d0 * day + 60 * (k + 1), uid, "view", 1.0))
        eid += 1
    return eid


def test_logrank_planted_replay(spark, tmp_path):
    """Planted two-cohort time-to-conversion: 3 day-one-engaged users
    (3 events on their first day) and 3 casual, same durations as the
    KM planted test.  Replayed with the textbook Mantel-Cox O/E/V."""
    rows = []
    eid = 0
    # engaged cohort
    eid = _surv_user(rows, eid, 1, 10, 12, True)    # dur 2, converted
    eid = _engage(rows, eid, 1, 10)
    eid = _surv_user(rows, eid, 2, 40, 42, True)    # dur 2, converted
    eid = _engage(rows, eid, 2, 40)
    eid = _surv_user(rows, eid, 3, 94, 99, False)   # dur 5, censored
    eid = _engage(rows, eid, 3, 94)
    # casual cohort
    eid = _surv_user(rows, eid, 4, 20, 22, True)    # dur 2, converted
    eid = _surv_user(rows, eid, 5, 30, 35, True)    # dur 5, converted
    rows.append((eid, 100 * 86400, 6, "view", 1.0))  # dur 0, censored
    d = _write_events(spark, tmp_path, rows)

    (got,) = registry.QUERIES["logrank_test_conversion"](spark, d).collect()
    # t=2: n=5 (durs>=2), n1=3, d=3, d1=2;  t=5: n=2, n1=1, d=1, d1=0
    e1 = 3 * (3 / 5) + 1 * (1 / 2)
    vv = 3 * (3 / 5) * (1 - 3 / 5) * ((5 - 3) / (5 - 1)) + 1 * 0.5 * 0.5 * 1.0
    assert (got.n_engaged, got.n_casual, got.observed_engaged) == (3, 3, 2)
    assert abs(got.expected_engaged - e1) < 1e-9
    assert abs(got.variance - vv) < 1e-9
    assert abs(got.z_score - (2 - e1) / math.sqrt(vv)) < 1e-6


def test_logrank_zero_variance_guard(spark, tmp_path):
    """A single-user corpus (one cohort empty, V=0) must yield NULL z,
    never an engine-specific inf/NaN."""
    rows = []
    _surv_user(rows, 0, 1, 0, 2, True)
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["logrank_test_conversion"](spark, d).collect()
    assert got.variance == 0.0 and got.z_score is None


# --- closed-form multiple OLS ---------------------------------------------------


def test_ols_planted_exact_fit(spark, tmp_path):
    """Points generated from y = 2 + 3*hour + 5*weekday exactly: the
    Cramer solve must recover the coefficients and R^2 = 1."""
    day = 86400
    # (weekday w, epoch-day k with (k+4)%7 == w) pairs
    pts = [(0, 3, 0), (1, 5, 2), (2, 4, 1), (5, 6, 3), (7, 2, 6), (3, 0, 4)]
    rows = []
    for i, (h, k, w) in enumerate(pts):
        assert (k + 4) % 7 == w
        rows.append((i, k * day + h * 3600, 100 + i, "view",
                     float(2 + 3 * h + 5 * w)))
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["ols_value_hour_dow"](spark, d).collect()
    assert got.n_events == len(pts)
    assert abs(got.beta0 - 2.0) < 1e-6
    assert abs(got.beta_hour - 3.0) < 1e-6
    assert abs(got.beta_dow - 5.0) < 1e-6
    assert abs(got.r2 - 1.0) < 1e-6


def test_ols_degenerate_design_dropped(spark, tmp_path):
    """A type whose regressors are constant (singular normal matrix,
    det=0) is dropped rather than emitting inf betas."""
    rows = [(i, i, 100 + i, "view", float(i)) for i in range(5)]  # all hour 0, day 0
    d = _write_events(spark, tmp_path, rows)
    assert registry.QUERIES["ols_value_hour_dow"](spark, d).count() == 0


# --- pinball loss ---------------------------------------------------------------


def test_pinball_planted_replay(spark, tmp_path):
    """48 hourly points, one per hour: day-1 values 10; day-2 hours
    24..41 at 12 (+2 error) and 42..47 at 8 (−2 error).  Hand-computed
    pinball means at tau 0.1/0.5/0.9."""
    rows = []
    for h in range(48):
        if h < 24:
            v = 10.0
        elif h < 42:
            v = 12.0
        else:
            v = 8.0
        rows.append((h, h * 3600, 1, "view", v))
    d = _write_events(spark, tmp_path, rows)
    (got,) = registry.QUERIES["pinball_loss_backtest"](spark, d).collect()
    assert got.n_forecasts == 24
    # +2 errors: q10 loss 0.2, q50 1.0, q90 1.8; -2 errors: 1.8, 1.0, 0.2
    assert abs(got.pinball_q10 - (18 * 0.2 + 6 * 1.8) / 24) < 1e-9
    assert abs(got.pinball_q50 - 1.0) < 1e-9
    assert abs(got.pinball_q90 - (18 * 1.8 + 6 * 0.2) / 24) < 1e-9


# --- isotonic calibration -------------------------------------------------------


def test_isotonic_matches_stack_pav_on_fixture(spark):
    """The minimax-form relational PAV equals the classic stack PAV on
    the fixture's score frame, is monotone, and conserves mass."""
    from decimal import Decimal

    from depositaja_spark import registry
    from depositaja_spark.functions.text import py_hash64

    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["isotonic_calibration"](spark, sf).collect()
    by_score = {r.score_cents: r for r in rows}
    scores = sorted(by_score)

    # independent group construction from the raw parquet
    import duckdb

    ev = duckdb.sql(
        f"SELECT event_id, event_type FROM '{sf}/events.parquet'"
    ).fetchall()
    g: dict = {}
    for eid, et in ev:
        p = py_hash64("brier:" + str(eid)) % 101
        c, s = g.get(p, (0, 0))
        g[p] = (c + 1, s + (1 if et == "purchase" else 0))
    assert sorted(g) == scores

    # stack PAV -> expand block averages back to per-score fitted values
    blocks = []
    order = sorted(g)
    for p in order:
        c, s = g[p]
        blocks.append([c, s, [p]])
        while len(blocks) > 1 and (
            blocks[-2][1] * blocks[-1][0] > blocks[-1][1] * blocks[-2][0]
        ):
            c2, s2, ids = blocks.pop()
            blocks[-1][0] += c2
            blocks[-1][1] += s2
            blocks[-1][2].extend(ids)
    want = {}
    for c, s, ids in blocks:
        for p in ids:
            want[p] = s / c
    for p in order:
        assert abs(by_score[p].fitted - want[p]) < 1e-6, p

    # monotone nondecreasing
    fitted = [by_score[p].fitted for p in order]
    assert all(a <= b + 1e-9 for a, b in zip(fitted, fitted[1:]))

    # mass conservation: sum fitted*c == sum y
    tot_fit = sum(by_score[p].fitted * g[p][0] for p in order)
    tot_y = sum(s for _, s in g.values())
    assert abs(tot_fit - tot_y) < 1e-2


# --- gains / lift table and KS ---------------------------------------------------


def _score_frame(sf):
    """(p_cents -> (count, positives)) replay of the shared pseudo-score."""
    import duckdb

    from depositaja_spark.functions.text import py_hash64

    ev = duckdb.sql(
        f"SELECT event_id, event_type FROM '{sf}/events.parquet'"
    ).fetchall()
    g: dict = {}
    for eid, et in ev:
        p = py_hash64("brier:" + str(eid)) % 101
        c, s = g.get(p, (0, 0))
        g[p] = (c + 1, s + (1 if et == "purchase" else 0))
    return g


def test_gains_table_python_replay(spark):
    """Cumulative gains equal a descending-score python fold; lift at
    the full population is exactly 1."""
    from depositaja_spark import registry

    sf = "/root/testdata/sf0.001"
    rows = {
        r.score_cents: r
        for r in registry.QUERIES["classifier_gains_table"](spark, sf).collect()
    }
    g = _score_frame(sf)
    n = sum(c for c, _ in g.values())
    pos = sum(s for _, s in g.values())
    cn = cp = 0
    for p in sorted(g, reverse=True):
        c, s = g[p]
        cn += c
        cp += s
        r = rows[p]
        assert (r.cum_n, r.cum_pos) == (cn, cp), p
        assert abs(r.recall - cp / pos) < 1e-6
        assert abs(r.precision - cp / cn) < 1e-6
        assert abs(r.lift - (cp / cn) / (pos / n)) < 1e-5
    # the lowest-score row covers everyone: lift exactly 1
    bottom = rows[min(rows)]
    assert bottom.cum_n == n and abs(bottom.lift - 1.0) < 1e-6


def test_classifier_ks_python_replay(spark):
    """KS equals the max |TPR − FPR| over thresholds computed in
    python, at the same (highest) attaining threshold."""
    from depositaja_spark import registry

    sf = "/root/testdata/sf0.001"
    (got,) = registry.QUERIES["classifier_ks"](spark, sf).collect()
    g = _score_frame(sf)
    pos = sum(s for _, s in g.values())
    neg = sum(c - s for c, s in g.values())
    cp = cf = 0
    best = (-1.0, None, None)
    for p in sorted(g, reverse=True):
        c, s = g[p]
        cp += s
        cf += c - s
        gap = cp / pos - cf / neg
        if abs(gap) > best[0] + 1e-15:
            best = (abs(gap), p, gap)
    assert got.threshold_cents == best[1]
    assert abs(got.ks_stat - best[0]) < 1e-6
    assert abs(got.tpr_minus_fpr - best[2]) < 1e-6
