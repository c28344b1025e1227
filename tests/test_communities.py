"""Label-propagation communities (functions/graph.py:label_propagation):
pure-Python synchronous replay on random graphs + structural goldens."""

from __future__ import annotations

import random

from depositaja_spark.functions.cache import release_caches
from depositaja_spark.functions.graph import label_propagation


def _python_lpa(edges, iterations):
    und: dict[int, list[int]] = {}
    for u, v in edges:
        und.setdefault(u, []).append(v)
        und.setdefault(v, []).append(u)
    labels = {n: n for n in und}
    for _ in range(iterations):
        nxt = {}
        for n, neigh in und.items():
            counts: dict[int, int] = {}
            for m in neigh:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            # most frequent, ties -> smallest label
            nxt[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def _run(spark, edges, iterations):
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.node: r.lbl for r in label_propagation(df, iterations).collect()}
    release_caches()
    return got


def test_matches_python_replay_on_random_graphs(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        nodes = list(range(30))
        edges = set()
        while len(edges) < 60:
            u, v = rng.sample(nodes, 2)
            edges.add((min(u, v), max(u, v)))
        edges = sorted(edges)
        for iters in (1, 3):
            assert _run(spark, edges, iters) == _python_lpa(edges, iters), (
                seed,
                iters,
            )


def test_two_cliques_one_bridge_stay_distinct(spark):
    """Two 5-cliques joined by a single bridge edge: frequency-competing
    labels keep the cliques in separate communities — the behavior that
    distinguishes LPA from connected components (which would merge
    everything into one)."""
    import itertools

    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(10, 15), 2))
    edges = c1 + c2 + [(4, 10)]
    got = _run(spark, edges, 4)
    side1 = {got[n] for n in range(5)}
    side2 = {got[n] for n in range(10, 15)}
    assert len(side1) == 1 and len(side2) == 1
    assert side1 != side2
    assert got == _python_lpa(edges, 4)


def test_isolated_pair_adopts_each_other(spark):
    """A disconnected edge (a, b): after one round each endpoint holds
    the other's id; after two, labels return — synchronous LPA's classic
    2-cycle, reproduced exactly (determinism contract, not hidden)."""
    edges = [(100, 200)]
    assert _run(spark, edges, 1) == {100: 200, 200: 100}
    assert _run(spark, edges, 2) == {100: 100, 200: 200}


# --- modularity ---------------------------------------------------------------


def test_modularity_two_cliques_hand_computed(spark):
    """Two 3-cliques joined by one bridge, hand-assigned communities:
    m=7, I=6, D_A=D_B=7 → Q = 6/7 − 98/196 = 0.357143 (textbook)."""
    from depositaja_spark.functions.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "u long, v long",
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 4)], "node long, lbl long"
    )
    (got,) = modularity(edges, labels).collect()
    assert (got.n_communities, got.n_edges, got.intra_edges) == (2, 7, 6)
    assert abs(got.modularity - (6 / 7 - 98 / 196)) < 1e-6


def test_modularity_single_community_is_nonpositive(spark):
    """Everything in one community: I=m but ΣD²=(2m)², so
    Q = 1 − 1 = 0 — the no-structure baseline."""
    from depositaja_spark.functions.graph import modularity

    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "u long, v long")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "node long, lbl long"
    )
    (got,) = modularity(edges, labels).collect()
    assert got.modularity == 0.0
