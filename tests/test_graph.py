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


# --- link prediction ------------------------------------------------------------


def _write_lineitem_baskets(spark, tmp_path, baskets):
    """baskets: list of part-id lists; order k holds basket[k].  Every
    basket is written twice (two distinct orders) so each co-purchase
    pair clears the min-support=2 edge filter."""
    rows = []
    ok = 0
    for parts in baskets:
        for _ in range(2):
            rows += [(ok, int(p)) for p in parts]
            ok += 1
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    d = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


def _naive_link_prediction(baskets, max_deg, topk=20):
    """Brute-force replay with exact integer RA accumulation."""
    from itertools import combinations

    edges = set()
    for parts in baskets:
        edges |= {tuple(sorted(p)) for p in combinations(set(parts), 2)}
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    scores: dict = {}
    for z, nbrs in adj.items():
        if len(nbrs) > max_deg:
            continue
        for x, y in combinations(sorted(nbrs), 2):
            cn, ras = scores.get((x, y), (0, 0))
            scores[(x, y)] = (cn + 1, ras + 10**12 // len(adj[z]))
    cand = [
        (cn, ras, x, y)
        for (x, y), (cn, ras) in scores.items()
        if (x, y) not in edges
    ]
    cand.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    return [
        (x, y, cn, round(ras / 1e12, 6)) for cn, ras, x, y in cand[:topk]
    ]


def test_copurchase_edges_cap_excludes_planted_pathological_basket(
    spark, tmp_path
):
    """MINING_MAX_BASKET property test for the GRAPH family's shared
    edge builder (the round-8 verdict's open flag): plant a 1000-line
    crawler-shaped "order" among normal baskets — copurchase_edges must
    return exactly the capped-semantics edge set (the pathological
    basket contributes NOTHING to support), and the whole graph family
    inherits the guarantee because every member now builds edges through
    this one function (enforced structurally by
    tests/test_plan_audit.py::test_no_uncapped_basket_self_join)."""
    from itertools import combinations

    from depositaja_spark.functions.graph import copurchase_edges
    from depositaja_spark.functions.mining import MINING_MAX_BASKET

    assert MINING_MAX_BASKET < 1000
    baskets = [[1, 2, 3], [2, 3, 4], [3, 4, 5], [1, 5, 6]]
    d = _write_lineitem_baskets(spark, tmp_path, baskets)
    # append the planted hot basket: 1000 distinct parts in ONE order
    hot = spark.createDataFrame(
        [(999_999, 100_000 + i) for i in range(1000)],
        "l_orderkey long, l_partkey long",
    )
    hot.coalesce(1).write.mode("append").parquet(f"{d}/lineitem.parquet")

    li = spark.read.parquet(f"{d}/lineitem.parquet")
    got = {(r.u, r.v) for r in copurchase_edges(li, min_support=2).collect()}

    want = set()
    for parts in baskets:  # each basket written twice → support 2
        want |= {tuple(sorted(p)) for p in combinations(set(parts), 2)}
    assert got == want
    assert all(p < 100_000 for e in got for p in e)


def test_link_prediction_matches_bruteforce(spark, tmp_path):
    """Overlapping cliques: predictions are exactly the brute-force
    non-edges ranked by (common neighbors, exact-integer RA)."""
    from depositaja_spark.registry import QUERIES

    baskets = [
        [1, 2, 3],
        [2, 3, 4],
        [3, 4, 5],
        [1, 5, 6],
        [6, 7],
        [2, 7],
    ]
    d = _write_lineitem_baskets(spark, tmp_path, baskets)
    got = [
        (r.part_a, r.part_b, r.common_neighbors, r.ra_score)
        for r in QUERIES["copurchase_link_prediction"](spark, d).collect()
    ]
    from depositaja_spark.queries_ml import LINKPRED_MAX_DEG

    assert got == _naive_link_prediction(baskets, LINKPRED_MAX_DEG)
    # sanity: at least one prediction exists and none is an existing edge
    assert got
    from itertools import combinations

    edges = set()
    for parts in baskets:
        edges |= {tuple(sorted(p)) for p in combinations(set(parts), 2)}
    assert all((a, b) not in edges for a, b, _, _ in got)


def test_link_prediction_hub_cap_excludes_center(spark, tmp_path, monkeypatch):
    """A planted super-hub (degree > cap) may not serve as a wedge
    CENTER: pairs connected only through it disappear, while it still
    appears as an endpoint of other predictions.  Asserted against the
    same brute force with the cap applied."""
    import depositaja_spark.queries_ml as qml
    from depositaja_spark.registry import QUERIES

    hub = 99
    spokes = list(range(1, 8))  # deg(hub) = 7 > patched cap of 4
    baskets = [[hub, s] for s in spokes]
    baskets += [[1, 2], [2, 3]]  # a small non-hub wedge: 1-3 via center 2
    d = _write_lineitem_baskets(spark, tmp_path, baskets)

    monkeypatch.setattr(qml, "LINKPRED_MAX_DEG", 4)
    # the oracle SQL was rendered at import with the shipped cap, so this
    # test drives the ENGINE path only (brute force is the referee)
    got = [
        (r.part_a, r.part_b, r.common_neighbors, r.ra_score)
        for r in QUERIES["copurchase_link_prediction"](spark, d).collect()
    ]
    want = _naive_link_prediction(baskets, max_deg=4)
    assert got == want
    # spoke-spoke pairs whose ONLY common neighbor is the hub must be
    # gone (spokes 4..7 have no other connections; 1-3 survives via the
    # legitimate non-hub center 2)
    only_hub = set(range(4, 8))
    assert all(
        not (a in only_hub and b in only_hub) for a, b, _, _ in got
    )
    # the surviving prediction is the non-hub wedge 1-3 through center 2
    assert (1, 3) in {(a, b) for a, b, _, _ in got}


def test_link_prediction_fixture_degrees_below_cap(spark):
    """The docstring's cap-invariance claim on the real fixture: every
    co-purchase node degree is far below LINKPRED_MAX_DEG, so the
    shipped oracle and the capped engine agree there by construction."""
    import pyspark.sql.functions as F

    from depositaja_spark.queries_ml import LINKPRED_MAX_DEG, _TRI_MIN_SUPPORT
    from depositaja_spark.sources import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count_distinct("ok").alias("s"))
        .filter(F.col("s") >= _TRI_MIN_SUPPORT)
    )
    und = edges.select(F.col("u").alias("n")).unionAll(
        edges.select(F.col("v").alias("n"))
    )
    max_deg = und.groupBy("n").count().agg(F.max("count")).collect()[0][0]
    # densest fixture is sf0.001 (max deg 51; sf0.01 → 13, sf0.1 → 6 —
    # a bigger part universe dilutes support-≥2 co-purchases)
    assert max_deg is not None and max_deg < LINKPRED_MAX_DEG
