"""Connected-components golden tests: topologies the oracle differential
exercises only implicitly (chains spanning multiple propagation rounds,
singletons, two separate components)."""

from __future__ import annotations

from depositaja_spark.functions.graph import connected_components, dedup_clusters


def test_chain_and_singleton(spark):
    vertices = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    # chain 5-4-3-2-1 (min label must travel 4 hops), pair 0-6? no: keep 0
    # isolated and 6 in the chain via 6-5
    edges = spark.createDataFrame(
        [(5, 4), (4, 3), (3, 2), (2, 1), (6, 5)], "a_id long, b_id long"
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1}


def test_two_components_and_keepers(spark):
    docs = spark.createDataFrame([(i,) for i in [10, 11, 12, 20, 21, 30]], "doc_id long")
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21)], "a_id long, b_id long"
    )
    got = {r.doc_id: (r.cluster_id, r.is_keeper) for r in dedup_clusters(docs, pairs).collect()}
    assert got == {
        10: (10, True), 11: (10, False), 12: (10, False),
        20: (20, True), 21: (20, False),
        30: (30, True),
    }


def test_cc_rounds_release_retired_checkpoints(spark):
    """ADVICE r2: each round's localCheckpoint must unpersist the previous
    round's blocks — pinned storage stays O(1) in rounds, not O(rounds).
    A 24-vertex chain needs several pointer-jumping rounds; the pinned-RDD
    count afterwards must not grow with the round count."""
    from pyspark.sql import functions as F

    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.graph import connected_components

    release_caches()
    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()

    n = 24
    verts = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a_id long, b_id long"
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components(verts, edges, small_graph_edges=0).collect()
    }
    assert got == {i: 0 for i in range(n)}

    growth = sc._jsc.getPersistentRDDs().size() - before
    # edges + sym caches + the final round's checkpoint (±1 for Spark's
    # internal bookkeeping) — NOT one block set per round
    assert growth <= 4, f"pinned RDDs grew by {growth} — retired rounds not released"
    release_caches()


def test_driver_and_distributed_tiers_agree(spark):
    """The small-graph union-find fast path and the distributed
    pointer-jumping loop must label identically on the same graph —
    chains (multi-round propagation), a dense triangle, and singletons."""
    verts = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    edges = spark.createDataFrame(
        # chain 1-2-3-4-5, triangle 7-8-9 (redundant edge), isolated 0,6,10,11
        [(5, 4), (4, 3), (3, 2), (2, 1), (7, 8), (8, 9), (7, 9)],
        "a_id long, b_id long",
    )
    fast = {
        r.id: r.cluster_id for r in connected_components(verts, edges).collect()
    }
    dist = {
        r.id: r.cluster_id
        for r in connected_components(verts, edges, small_graph_edges=0).collect()
    }
    assert fast == dist == {
        0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6,
        7: 7, 8: 7, 9: 7, 10: 10, 11: 11,
    }
