"""Frequent-itemset mining over keyed baskets (A-priori levels 2-3).

Shared by the registered queries AND their randomized brute-force tests
so the adversarial-shape coverage always exercises the shipped plan —
a copy of the plan in a test validates only the copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import tracked_persist


def frequent_triples(
    li2: DataFrame, min_support: int, ok_col: str = "ok", p_col: str = "p"
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

    Returns (part_a, part_b, part_c, support) with a < b < c."""
    li2 = li2.select(F.col(ok_col).alias("ok"), F.col(p_col).alias("p"))
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
