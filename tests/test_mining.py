"""Frequent-itemset mining + item-item CF: parity with pure-Python
brute force on randomized baskets (the oracle differential checks the
fixture; these check the combinatorics on adversarial shapes — big
baskets, heavy co-occurrence, support boundaries)."""

from __future__ import annotations

import itertools
import math
import random

from pyspark.sql import functions as F


def _random_baskets(seed, n_orders=60, n_parts=12, max_basket=6):
    rng = random.Random(seed)
    rows = []
    for ok in range(n_orders):
        parts = rng.sample(range(n_parts), rng.randint(1, max_basket))
        # duplicate lines for some parts — support must count ORDERS
        for p in parts:
            for _ in range(rng.randint(1, 2)):
                rows.append((ok, p))
    return rows


def _li(spark, rows):
    return spark.createDataFrame(
        [(ok, p, 1) for ok, p in rows],
        "l_orderkey long, l_partkey long, l_linenumber int",
    )


def test_triples_match_brute_force(spark):
    """Runs the SAME shared plan as the registered query
    (functions/mining.py:frequent_triples) — not a copy of it — so the
    adversarial-shape coverage applies to shipped code."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.mining import frequent_triples
    from depositaja_spark.queries_olap import _TRIPLE_MIN_SUPPORT

    for seed in (1, 2, 3):
        rows = _random_baskets(seed)
        li = _li(spark, rows)
        li2 = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
        ).distinct()
        got = {
            (r.part_a, r.part_b, r.part_c): r.support
            for r in frequent_triples(li2, _TRIPLE_MIN_SUPPORT).collect()
        }
        release_caches()

        baskets: dict[int, set[int]] = {}
        for ok, p in rows:
            baskets.setdefault(ok, set()).add(p)
        want: dict = {}
        for bs in baskets.values():
            for tri in itertools.combinations(sorted(bs), 3):
                want[tri] = want.get(tri, 0) + 1
        want = {k: v for k, v in want.items() if v >= _TRIPLE_MIN_SUPPORT}
        assert got == want, seed


def test_item_similarity_matches_brute_force(spark):
    """Cosine over binary basket vectors + deterministic top-k, vs a
    pure-Python recomputation (including the min-co prune)."""
    from depositaja_spark.queries_olap import _ITEMSIM_K, _ITEMSIM_MIN_CO

    rows = _random_baskets(7, n_orders=80, n_parts=10)
    li = _li(spark, rows)

    deg = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count_distinct("l_orderkey").alias("n")
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count_distinct("ok").alias("co"))
        .filter(F.col("co") >= _ITEMSIM_MIN_CO)
    )
    sym = co.select(
        F.col("pa").alias("part"), F.col("pb").alias("other"), "co"
    ).unionByName(co.select(F.col("pb").alias("part"), F.col("pa").alias("other"), "co"))
    from pyspark.sql import Window as W

    scored = (
        sym.join(deg.select("part", F.col("n").alias("na")), "part")
        .join(deg.select(F.col("part").alias("other"), F.col("n").alias("nb")), "other")
        .select(
            "part",
            "other",
            F.round(F.col("co").cast("double") / F.sqrt(F.col("na") * F.col("nb")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("part").orderBy(F.desc("sim"), F.asc("other"))
    got = {
        (r.part, r.rank): (r.other, r.sim)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ITEMSIM_K)
        .collect()
    }

    baskets: dict[int, set[int]] = {}
    for ok, p in rows:
        baskets.setdefault(ok, set()).add(p)
    deg_py: dict[int, int] = {}
    co_py: dict = {}
    for bs in baskets.values():
        for p in bs:
            deg_py[p] = deg_py.get(p, 0) + 1
        for x, y in itertools.combinations(sorted(bs), 2):
            co_py[(x, y)] = co_py.get((x, y), 0) + 1
    neigh: dict[int, list] = {}
    for (x, y), c in co_py.items():
        if c < _ITEMSIM_MIN_CO:
            continue
        s = round(c / math.sqrt(deg_py[x] * deg_py[y]), 6)
        neigh.setdefault(x, []).append((-s, y))
        neigh.setdefault(y, []).append((-s, x))
    want = {}
    for part, lst in neigh.items():
        for rank, (negs, other) in enumerate(sorted(lst)[: _ITEMSIM_K], 1):
            want[(part, rank)] = (other, -negs)
    assert got == want
