"""Degree-oriented triangle counting vs a naive itertools reference."""

from __future__ import annotations

from itertools import combinations

import pytest

from depositaja_spark.functions.graph import triangle_count


def _naive(edges):
    es = {tuple(sorted(e)) for e in edges}
    verts = sorted({v for e in es for v in e})
    return sum(
        1
        for a, b, c in combinations(verts, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


def _spark_count(spark, edges):
    df = spark.createDataFrame(
        [tuple(sorted(e)) for e in edges], "src long, dst long"
    ).distinct()
    return triangle_count(df).collect()[0]["n_triangles"]


@pytest.mark.parametrize(
    "edges,want",
    [
        # K4: every vertex triple closes
        ([(a, b) for a, b in combinations(range(4), 2)], 4),
        # path: no closure
        ([(1, 2), (2, 3), (3, 4)], 0),
        # star hub: wedges everywhere, zero triangles — the shape where
        # naive wedge counting explodes and orientation must not
        ([(0, i) for i in range(1, 8)], 0),
        # two triangles sharing an edge
        ([(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)], 2),
    ],
)
def test_goldens(spark, edges, want):
    assert _spark_count(spark, edges) == want
    assert _naive(edges) == want  # the reference agrees with itself


def test_matches_naive_on_pseudorandom_graph(spark):
    # deterministic pseudorandom graph: multiplicative-hash edge pick
    edges = []
    for i in range(200):
        u = (i * 2654435761) % 23
        v = (i * 40503) % 23
        if u != v:
            edges.append((min(u, v), max(u, v)))
    assert _spark_count(spark, edges) == _naive(edges)


def test_triangles_per_node_two_sharing_an_edge(spark):
    """Bowtie-free known graph: triangles {1,2,3} and {2,3,4} sharing
    edge (2,3) — corners counted per node, hub orientation included."""
    from depositaja_spark.functions.graph import triangles_per_node

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src long, dst long"
    )
    got = {r.node: r.n_tri for r in triangles_per_node(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangles_per_node_sums_to_three_times_global(spark):
    """Σ per-node counts == 3 × the global triangle count (every
    triangle has exactly three corners) on a denser planted graph."""
    import itertools

    from depositaja_spark.functions.graph import triangle_count, triangles_per_node

    edges = list(itertools.combinations(range(6), 2))  # K6
    df = spark.createDataFrame(edges, "src long, dst long")
    per = triangles_per_node(df).agg({"n_tri": "sum"}).collect()[0][0]
    (tot,) = triangle_count(df).collect()
    assert per == 3 * tot.n_triangles == 3 * 20  # C(6,3)
