"""k-core peeling: goldens, convergence, and fixed-point properties.

The generated unrolled-CTE oracle (tests/test_oracle.py) replays the
peeling in DuckDB; these tests pin the semantics against hand-built
graphs and an independent Python peeler."""

from __future__ import annotations

import collections
from itertools import combinations

import pytest

from depositaja_spark.functions.graph import k_core


def _py_kcore(edges, k):
    es = {tuple(sorted(e)) for e in edges}
    while True:
        deg = collections.Counter()
        for u, v in es:
            deg[u] += 1
            deg[v] += 1
        bad = {x for x, d in deg.items() if d < k}
        if not bad:
            break
        es = {(u, v) for u, v in es if u not in bad and v not in bad}
    deg = collections.Counter()
    for u, v in es:
        deg[u] += 1
        deg[v] += 1
    return dict(deg)


def _spark_kcore(spark, edges, k, max_rounds=20):
    df = spark.createDataFrame(
        sorted({tuple(sorted(e)) for e in edges}), "src long, dst long"
    )
    return {
        r["id"]: r["deg"]
        for r in k_core(df, k=k, max_rounds=max_rounds).collect()
    }


def test_k4_is_its_own_3core(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    assert _spark_kcore(spark, k4, 3) == {i: 3 for i in range(4)}


def test_pendant_chain_peels_away(spark):
    """A triangle with a dangling path: the path peels vertex by vertex
    (multiple rounds), the triangle survives as the 2-core."""
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    assert _spark_kcore(spark, edges, 2) == {1: 2, 2: 2, 3: 2}


def test_empty_core(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    assert _spark_kcore(spark, edges, 3) == {}


def test_cascade_matches_python_peeler(spark):
    """Two K4s joined by a bridge; removing the bridge's support
    cascades.  Compared against the independent peeler."""
    a = [(i, j) for i, j in combinations([0, 1, 2, 3], 2)]
    b = [(i, j) for i, j in combinations([10, 11, 12, 13], 2)]
    edges = a + b + [(3, 10), (2, 20), (20, 21)]
    for k in (1, 2, 3, 4):
        assert _spark_kcore(spark, edges, k) == _py_kcore(edges, k)


def test_unconverged_warns(spark):
    """A long path at k=2 peels one end per round; a too-small round
    budget must warn rather than silently return the prefix."""
    edges = [(i, i + 1) for i in range(8)]
    with pytest.warns(RuntimeWarning, match="fixed point"):
        got = _spark_kcore(spark, edges, 2, max_rounds=2)
    assert got  # prefix, not the (empty) core
