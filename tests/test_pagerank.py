"""PageRank: conservation, numpy power-iteration parity, dangling mass.

The generated chained-CTE oracle (tests/test_oracle.py) replays the same
fold in DuckDB; these tests verify the fold against an INDEPENDENT dense
implementation and pin the invariants that make the distributed version
trustworthy at depth."""

from __future__ import annotations

import numpy as np
import pytest

from depositaja_spark.functions.cache import release_caches
from depositaja_spark.functions.pagerank import pagerank


@pytest.fixture(autouse=True)
def _release():
    yield
    release_caches()


def _dense_pagerank(edges, iterations, damping=0.85):
    """Reference: dense power iteration with uniform dangling spread."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return {nodes[i]: r[i] for i in range(n)}


_EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # e is dangling via no out-edges? add one below
    ("d", "e"),  # e: dangling sink
]


def _spark_ranks(spark, edges, iterations):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = pagerank(df, iterations=iterations).collect()
    return {r["id"]: r["pr"] for r in got}


@pytest.mark.parametrize("iters", [1, 4])
def test_matches_dense_power_iteration(spark, iters):
    got = _spark_ranks(spark, _EDGES, iters)
    want = _dense_pagerank(_EDGES, iters)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_ranks_conserve_mass(spark):
    """Uniform dangling redistribution keeps Σpr = 1 at every depth —
    the property that distinguishes this formulation from the lossy
    'drop dangling mass' shortcut."""
    got = _spark_ranks(spark, _EDGES, 5)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_sink_accumulates_more_than_isolated_source(spark):
    """A node everyone links to outranks a node nobody links to."""
    got = _spark_ranks(spark, _EDGES, 4)
    assert got["c"] > got["d"]


def test_parallel_edges_weight_contributions(spark):
    """Documented semantics: duplicate (u,v) rows count multiplicatively
    — u's rank splits over edge INSTANCES, so a doubled edge carries
    2/3 of u's mass, not 1/2."""
    dup = [("u", "v"), ("u", "v"), ("u", "w")]
    got = _spark_ranks(spark, dup, 1)
    n = 3
    base = 1.0 / n
    d = 0.85
    # v and w are both dangling; their round-0 mass returns uniformly
    dangle = 2 * base / n
    want_v = (1 - d) / n + d * (base * 2 / 3 + dangle)
    want_w = (1 - d) / n + d * (base * 1 / 3 + dangle)
    assert got["v"] == pytest.approx(want_v, abs=1e-12)
    assert got["w"] == pytest.approx(want_w, abs=1e-12)


def test_final_round_blocks_released_by_release_caches(spark):
    """Regression: pagerank's final localCheckpoint blocks had no
    release path — release_caches() must retire them via the
    tracked-pinned-RDD registry."""
    from depositaja_spark.functions.cache import pinned_rdd_ids, release_caches

    sc = spark.sparkContext
    release_caches()
    base = pinned_rdd_ids(sc)
    e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    pagerank(e, iterations=2).collect()
    pinned_after = pinned_rdd_ids(sc) - base
    assert pinned_after, "final round should be pinned until released"
    release_caches()
    assert not (pinned_rdd_ids(sc) - base), "release_caches must retire the final round"


# --- personalized (seeded) variant -------------------------------------------


def _dense_ppr(edges, seeds, iterations, damping=0.85):
    """Reference: dense personalized power iteration — teleport AND
    dangling mass go to the seed distribution."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges} | set(seeds))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    s = np.zeros(n)
    for sd in set(seeds):
        s[idx[sd]] = 1.0 / len(set(seeds))
    r = s.copy()
    for _ in range(iterations):
        nxt = np.zeros(n)
        for u, v in edges:
            nxt[idx[v]] += r[idx[u]] / out[idx[u]]
        dangling = r[out == 0].sum()
        r = (1 - damping) * s + damping * (nxt + dangling * s)
    return {nodes[i]: r[i] for i in range(n)}


def _spark_ppr(spark, edges, seeds, iterations):
    from depositaja_spark.functions.pagerank import personalized_pagerank

    e = spark.createDataFrame(edges, "src string, dst string")
    sd = spark.createDataFrame([(x,) for x in seeds], "id string")
    return {
        r["id"]: r["pr"]
        for r in personalized_pagerank(e, sd, iterations=iterations).collect()
    }


@pytest.mark.parametrize("iters", [1, 4])
def test_ppr_matches_dense(spark, iters):
    got = _spark_ppr(spark, _EDGES, ["a", "d"], iters)
    want = _dense_ppr(_EDGES, ["a", "d"], iters)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_ppr_mass_conserved_and_unreachable_zero(spark):
    # component 1: a→b; component 2: c→d.  Seeding only {a} must leave
    # c and d at EXACTLY zero (not (1-d)/N) and keep total mass 1.
    edges = [("a", "b"), ("c", "d")]
    got = _spark_ppr(spark, edges, ["a"], 4)
    assert got["c"] == 0.0 and got["d"] == 0.0
    assert abs(sum(got.values()) - 1.0) < 1e-12
    assert got["a"] > 0 and got["b"] > 0


def test_ppr_isolated_seed_holds_mass(spark):
    # a seed with no edges at all still appears and holds teleport mass
    edges = [("x", "y")]
    got = _spark_ppr(spark, edges, ["z"], 3)
    assert set(got) == {"x", "y", "z"}
    assert abs(sum(got.values()) - 1.0) < 1e-12
    assert got["z"] > 0.5  # z keeps its teleport share plus dangling returns


def test_standard_pagerank_is_ppr_with_uniform_seeds(spark):
    """Drift guard for the two deliberately-separate implementations
    (merging them would change float op order under the oracles):
    standard PageRank IS personalized PageRank with the seed set equal
    to ALL nodes — teleport (1-d)/n == (1-d)·s and dangling m/n == m·s
    when s = 1/n.  Any future change to one iteration body that doesn't
    reach the other breaks this equality."""
    nodes = sorted({u for u, _ in _EDGES} | {v for _, v in _EDGES})
    std = _spark_ranks(spark, _EDGES, 4)
    seeded = _spark_ppr(spark, _EDGES, nodes, 4)
    assert set(std) == set(seeded)
    for k in std:
        assert abs(std[k] - seeded[k]) < 1e-12, k


# --- HITS ----------------------------------------------------------------------


def _hits_numpy(edges, iterations):
    """Exact integer replay of the un-normalized power method."""
    us = sorted({u for u, _ in edges})
    ps = sorted({p for _, p in edges})
    ui = {u: i for i, u in enumerate(us)}
    pi = {p: i for i, p in enumerate(ps)}
    import numpy as np

    E = np.zeros((len(us), len(ps)), dtype=object)
    for u, p in edges:
        E[ui[u], pi[p]] = 1
    h = np.ones(len(us), dtype=object)
    for _ in range(iterations):
        a = E.T @ h
        h = E @ a
    return (
        {p: a[pi[p]] for p in ps},
        {u: h[ui[u]] for u in us},
    )


def test_hits_matches_integer_replay(spark):
    """Raw DECIMAL scores equal the exact integer power method on an
    asymmetric bipartite graph."""
    from depositaja_spark.functions.pagerank import hits

    edges = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10), (4, 13)]
    df = spark.createDataFrame(edges, "u long, p long")
    a, h = hits(df, 3)
    want_a, want_h = _hits_numpy(edges, 3)
    got_a = {r.p: int(r.s) for r in a.collect()}
    got_h = {r.u: int(r.s) for r in h.collect()}
    assert got_a == want_a
    assert got_h == want_h


def test_hits_authority_ranks_mutual_reinforcement_over_degree(spark):
    """Two parts with EQUAL degree: the one bought by the stronger hubs
    must out-rank the other — the property degree counting misses."""
    from depositaja_spark.functions.pagerank import hits

    # parts 20 and 21 both have degree 2; 20's buyers are broad hubs
    edges = [(1, 10), (1, 11), (1, 20), (2, 10), (2, 11), (2, 20),
             (3, 21), (4, 21)]
    df = spark.createDataFrame(edges, "u long, p long")
    a, _ = hits(df, 3)
    scores = {r.p: int(r.s) for r in a.collect()}
    assert scores[20] > scores[21]


def test_weighted_oracle_mirrors_nonpositive_weight_drop(spark):
    """r11 ADVICE: the engine drops w<=0 edges up front; the oracle SQL
    must mirror the filter or a non-positive-weight edge would still
    feed the oracle's node set / out-strength / rank flow.  Run BOTH
    engines on a graph where the filtered edge changes the answer (it
    introduces node z and redirects half of u's out-strength)."""
    import duckdb

    from depositaja_spark.functions.pagerank import (
        weighted_pagerank,
        weighted_pagerank_oracle_sql,
    )

    edges = [("u", "v", 2.0), ("u", "z", -2.0), ("v", "u", 1.0),
             ("u", "w", 0.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r.id: round(r.pr * 2, 6)  # 2 live nodes after the drop (z, w gone)
        for r in weighted_pagerank(df, iterations=3).collect()
    }
    # the oracle sees the RAW edge list including the poisoned rows
    values = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in edges)
    raw = f"SELECT * FROM (VALUES {values}) AS t(src, dst, w)"
    sql = weighted_pagerank_oracle_sql(raw, iterations=3)
    want = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert set(want) == {"u", "v"} == set(got)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)
