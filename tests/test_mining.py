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


def _itemsim_brute(rows, k, min_co, max_basket=None):
    """Pure-Python item-item CF replay (capped semantics when
    max_basket is given: oversized baskets excluded from degrees AND
    co-occurrence, matching mining.item_similarity_topk)."""
    baskets: dict[int, set[int]] = {}
    for ok, p in rows:
        baskets.setdefault(ok, set()).add(p)
    if max_basket is not None:
        baskets = {ok: bs for ok, bs in baskets.items() if len(bs) <= max_basket}
    deg_py: dict[int, int] = {}
    co_py: dict = {}
    for bs in baskets.values():
        for p in bs:
            deg_py[p] = deg_py.get(p, 0) + 1
        for x, y in itertools.combinations(sorted(bs), 2):
            co_py[(x, y)] = co_py.get((x, y), 0) + 1
    neigh: dict[int, list] = {}
    for (x, y), c in co_py.items():
        if c < min_co:
            continue
        s = round(c / math.sqrt(deg_py[x] * deg_py[y]), 6)
        neigh.setdefault(x, []).append((-s, y))
        neigh.setdefault(y, []).append((-s, x))
    want = {}
    for part, lst in neigh.items():
        for rank, (negs, other) in enumerate(sorted(lst)[:k], 1):
            want[(part, rank)] = (other, -negs)
    return want


def test_item_similarity_matches_brute_force(spark):
    """Cosine over binary basket vectors + deterministic top-k, vs a
    pure-Python recomputation (including the min-co prune) — runs the
    SAME shared plan as the registered query
    (functions/mining.py:item_similarity_topk), not a copy of it."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.mining import item_similarity_topk
    from depositaja_spark.queries_olap import _ITEMSIM_K, _ITEMSIM_MIN_CO

    rows = _random_baskets(7, n_orders=80, n_parts=10)
    li2 = (
        _li(spark, rows)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    got = {
        (r.part, r.rank): (r.other, r.sim)
        for r in item_similarity_topk(li2, _ITEMSIM_K, _ITEMSIM_MIN_CO).collect()
    }
    release_caches()
    assert got == _itemsim_brute(rows, _ITEMSIM_K, _ITEMSIM_MIN_CO)


def test_hot_basket_cap_excludes_planted_pathological_basket(spark):
    """MINING_MAX_BASKET property test: plant a 1000-line basket among
    normal ones — both mining plans must return exactly the capped-
    semantics answer (the pathological basket contributes NOTHING to
    support, degree, or co-occurrence), and they must do it without
    materializing that basket's ~5·10^5 within-basket pairs."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.mining import (
        MINING_MAX_BASKET,
        frequent_triples,
        item_similarity_topk,
    )

    assert MINING_MAX_BASKET < 1000
    rows = _random_baskets(11, n_orders=50, n_parts=10)
    # the planted crawler "order": 1000 distinct parts in one basket
    rows += [(999_999, 100_000 + i) for i in range(1000)]
    li2 = (
        _li(spark, rows)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
        .distinct()
    )

    kept_rows = [(ok, p) for ok, p in rows if ok != 999_999]
    baskets: dict[int, set[int]] = {}
    for ok, p in kept_rows:
        baskets.setdefault(ok, set()).add(p)
    want_tri: dict = {}
    for bs in baskets.values():
        for tri in itertools.combinations(sorted(bs), 3):
            want_tri[tri] = want_tri.get(tri, 0) + 1
    want_tri = {k: v for k, v in want_tri.items() if v >= 2}

    got_tri = {
        (r.part_a, r.part_b, r.part_c): r.support
        for r in frequent_triples(li2, 2).collect()
    }
    assert got_tri == want_tri
    # none of the planted parts may appear anywhere in the output
    assert all(p < 100_000 for tri in got_tri for p in tri)

    got_sim = {
        (r.part, r.rank): (r.other, r.sim)
        for r in item_similarity_topk(li2, 3, 2).collect()
    }
    release_caches()
    assert got_sim == _itemsim_brute(rows, 3, 2, max_basket=MINING_MAX_BASKET)
    assert all(p < 100_000 for p, _ in got_sim)


def test_association_rules_match_brute_force(spark):
    """association_rules vs a pure-Python replay on randomized baskets,
    including the capped semantics with a planted oversized basket:
    support / confidence / lift / leverage all exact, thresholds applied
    identically (integer cross-multiplication for confidence)."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.mining import association_rules

    min_support, min_conf_pct, cap = 2, 10, 8
    for seed in (11, 12):
        rows = _random_baskets(seed)
        # planted pathological basket: bigger than the cap, must vanish
        # from supports, pairs, AND the N normalizer
        rows += [(999, p) for p in range(10)]
        li2 = _li(spark, rows).select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
        ).distinct()
        got = {
            (r.antecedent, r.consequent): (
                r.support,
                round(r.confidence, 9),
                round(r.lift, 9),
                round(r.leverage, 9),
            )
            for r in association_rules(
                li2, min_support, min_conf_pct, max_basket=cap
            ).collect()
        }
        release_caches()

        baskets: dict[int, set[int]] = {}
        for ok, p in rows:
            baskets.setdefault(ok, set()).add(p)
        kept = {ok: bs for ok, bs in baskets.items() if len(bs) <= cap}
        n = len(kept)
        supp: dict[int, int] = {}
        pair: dict[tuple, int] = {}
        for bs in kept.values():
            for p in bs:
                supp[p] = supp.get(p, 0) + 1
            for a, b in itertools.combinations(sorted(bs), 2):
                pair[(a, b)] = pair.get((a, b), 0) + 1
        want = {}
        for (a, b), s in pair.items():
            if s < min_support:
                continue
            for ante, cons in ((a, b), (b, a)):
                if 100 * s < min_conf_pct * supp[ante]:
                    continue
                want[(ante, cons)] = (
                    s,
                    round(s / supp[ante], 9),
                    round(s * n / (supp[ante] * supp[cons]), 9),
                    round(s / n - supp[ante] * supp[cons] / (n * n), 9),
                )
        assert got == want, seed
