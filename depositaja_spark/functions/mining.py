"""Frequent-itemset mining over keyed baskets (A-priori levels 2-3).

Shared by the registered queries AND their randomized brute-force tests
so the adversarial-shape coverage always exercises the shipped plan —
a copy of the plan in a test validates only the copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import tracked_persist

# Hot-basket cap: every within-basket pair self-join in this module has
# Σ basket² fan-out, so ONE pathological basket (a crawler's 10^5-line
# "order") yields ~10^10 pairs from a single key — the same adversarial
# skew class DEDUP_MAX_DF kills in the dedup family.  Baskets above the
# cap are EXCLUDED from the model entirely (support/degree/co-occurrence
# all count only kept baskets, so similarity stays a true cosine over
# the population actually joined); the oracles mirror the identical
# capped semantics.  TPC-H baskets are ≤7 lines by generator bound, so
# the fixture answer is unchanged — the cap exists for the web-scale
# input shape, and the per-key fan-out term is bounded by cap² forever.
MINING_MAX_BASKET = 64


def cap_baskets(
    items: DataFrame, ok_col: str = "ok", max_basket: int = MINING_MAX_BASKET
) -> DataFrame:
    """Drop every basket with more than ``max_basket`` distinct items
    before a within-basket self-join.  ``items`` must be DISTINCT on
    (basket, item); the size count is then one keyed agg and the filter
    one semi-join — both map-side-combinable, no skew amplification."""
    kept = (
        items.groupBy(ok_col)
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") <= max_basket)
        .select(ok_col)
    )
    return items.join(kept, ok_col, "left_semi")


def frequent_triples(
    li2: DataFrame,
    min_support: int,
    ok_col: str = "ok",
    p_col: str = "p",
    max_basket: int = MINING_MAX_BASKET,
) -> DataFrame:
    """Level-3 frequent itemsets over distinct (basket, item) rows with
    the full A-priori downward-closure prune.

    ``li2`` must be DISTINCT on (ok_col, p_col) — support then equals
    the basket count.  The basket-keyed pair self-join is built ONCE
    and persisted (it is the dominant intermediate: Σ basket² rows);
    the frequent-pair set and the pruned triple fan-out both derive
    from it.  Candidate triples are semi-joined against the frequent
    pairs on all three faces BEFORE the support count — support
    monotonicity guarantees the pruned plan equals the clean brute
    count, while the fan-out only grows along frequent-pair edges.

    Baskets larger than ``max_basket`` are dropped first (see
    ``MINING_MAX_BASKET``), so the pair fan-out per key is ≤ cap².

    Returns (part_a, part_b, part_c, support) with a < b < c."""
    li2 = li2.select(F.col(ok_col).alias("ok"), F.col(p_col).alias("p"))
    li2 = cap_baskets(li2, "ok", max_basket)
    # the heaviest intermediate, built once: all within-basket ordered
    # pairs (ok, pa, pb)
    pairs = tracked_persist(
        li2.alias("a")
        .join(
            li2.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.p") < F.col("b.p")),
        )
        .select(
            F.col("a.ok").alias("ok"),
            F.col("a.p").alias("pa"),
            F.col("b.p").alias("pb"),
        )
    )
    fp = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_support)
        .select("pa", "pb")
    )
    j2 = pairs.join(fp, ["pa", "pb"], "left_semi")
    j3 = (
        j2.alias("j")
        .join(
            li2.alias("c"),
            (F.col("j.ok") == F.col("c.ok")) & (F.col("j.pb") < F.col("c.p")),
        )
        .select(F.col("j.ok").alias("ok"), "pa", "pb", F.col("c.p").alias("pc"))
        .join(
            fp.select(F.col("pa").alias("pb"), F.col("pb").alias("pc")),
            ["pb", "pc"],
            "left_semi",
        )
        .join(fp.select(F.col("pa"), F.col("pb").alias("pc")), ["pa", "pc"], "left_semi")
    )
    return (
        j3.groupBy(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("pc").alias("part_c"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def item_similarity_topk(
    li2: DataFrame,
    k: int,
    min_co: int,
    ok_col: str = "ok",
    p_col: str = "p",
    max_basket: int = MINING_MAX_BASKET,
) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity over binary
    basket-occurrence vectors — sim(a,b) = |baskets with both| /
    √(|baskets with a|·|baskets with b|) — then each item's top-``k``
    neighbours (ties broken by ascending neighbour id), pruning pairs
    co-occurring in fewer than ``min_co`` baskets.

    ``li2`` must be DISTINCT on (ok_col, p_col).  Baskets above
    ``max_basket`` are dropped BEFORE anything else (degrees included),
    so similarity is an exact cosine over the kept population and the
    basket-keyed pair join's per-key fan-out is ≤ cap².

    Returns (part, other, sim, rank) with rank 1-based per part."""
    li2 = li2.select(F.col(ok_col).alias("ok"), F.col(p_col).alias("p"))
    li2 = tracked_persist(cap_baskets(li2, "ok", max_basket))
    deg = li2.groupBy(F.col("p").alias("part")).agg(
        F.count(F.lit(1)).alias("n")
    )
    co = (
        li2.alias("a")
        .join(
            li2.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= min_co)
    )
    sym = co.select(
        F.col("pa").alias("part"), F.col("pb").alias("other"), "co"
    ).unionByName(
        co.select(F.col("pb").alias("part"), F.col("pa").alias("other"), "co")
    )
    scored = (
        sym.join(deg.select("part", F.col("n").alias("na")), "part")
        .join(
            deg.select(F.col("part").alias("other"), F.col("n").alias("nb")),
            "other",
        )
        .select(
            "part",
            "other",
            F.round(
                F.col("co").cast("double") / F.sqrt(F.col("na") * F.col("nb")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("part").orderBy(F.desc("sim"), F.asc("other"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("part", "other", "sim", F.col("rank").cast("int").alias("rank"))
    )


def association_rules(
    li2: DataFrame,
    min_support: int,
    min_conf_pct: int,
    ok_col: str = "ok",
    p_col: str = "p",
    max_basket: int = MINING_MAX_BASKET,
) -> DataFrame:
    """Association rules a → b over keyed baskets with the three classic
    strength measures (Agrawal/Srikant A-priori level 2 plus scoring):

      confidence(a→b) = supp(ab) / supp(a)       (conditional probability)
      lift(a→b)       = supp(ab)·N / (supp(a)·supp(b))   (>1 ⇒ positive
                        association beyond independence; symmetric)
      leverage(a→b)   = supp(ab)/N − supp(a)·supp(b)/N²  (additive twin)

    ``li2`` must be DISTINCT on (ok_col, p_col); baskets above
    ``max_basket`` are dropped first (see MINING_MAX_BASKET), and N —
    the basket population every measure is normalized by — counts only
    kept baskets, so the probabilities are exact over the population
    actually joined.  Pairs need ``min_support`` baskets; rules need
    confidence ≥ min_conf_pct/100, enforced as the integer
    cross-multiplication 100·supp(ab) ≥ min_conf_pct·supp(a) (no float
    threshold).  The measures themselves ship RAW doubles with one
    fixed op order (engine/oracle bit parity; the driver rounds at
    compare time).

    Plan: one capped pair self-join (fan-out ≤ cap² per basket), one
    item-support agg, a 1-row N frame broadcast by cross join, two
    equi-joins against the |items|-sized support frame.  Returns
    (antecedent, consequent, support, confidence, lift, leverage)."""
    li2 = li2.select(F.col(ok_col).alias("ok"), F.col(p_col).alias("p"))
    li2 = tracked_persist(cap_baskets(li2, "ok", max_basket))
    nb = li2.agg(F.count_distinct("ok").alias("nb"))
    item = li2.groupBy(F.col("p").alias("item")).agg(
        F.count(F.lit(1)).alias("supp_item")
    )
    co = (
        li2.alias("a")
        .join(
            li2.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.p") < F.col("b.p")),
        )
        .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .filter(F.col("supp_ab") >= min_support)
    )
    rules = co.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "supp_ab"
    ).unionByName(
        co.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "supp_ab"
        )
    )
    scored = (
        rules.join(
            item.select(F.col("item").alias("antecedent"), F.col("supp_item").alias("supp_a")),
            "antecedent",
        )
        .join(
            item.select(F.col("item").alias("consequent"), F.col("supp_item").alias("supp_b")),
            "consequent",
        )
        .crossJoin(F.broadcast(nb))
        .filter(F.lit(100) * F.col("supp_ab") >= F.lit(min_conf_pct) * F.col("supp_a"))
    )
    return scored.select(
        "antecedent",
        "consequent",
        F.col("supp_ab").alias("support"),
        (F.col("supp_ab").cast("double") / F.col("supp_a")).alias("confidence"),
        (
            (F.col("supp_ab").cast("double") * F.col("nb"))
            / (F.col("supp_a") * F.col("supp_b"))
        ).alias("lift"),
        (
            F.col("supp_ab").cast("double") / F.col("nb")
            - (F.col("supp_a").cast("double") * F.col("supp_b"))
            / (F.col("nb").cast("double") * F.col("nb"))
        ).alias("leverage"),
    )
