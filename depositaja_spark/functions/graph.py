"""Connected components over a pair graph — dedup cluster assignment.

Near-dup detection (MinHash-LSH, SimHash, embedding cosine) yields PAIRS;
deduplication needs GROUPS: every document labeled with its cluster
representative (the minimum doc_id reachable through any chain of
near-dup edges), so one keeper per cluster can be chosen and the rest
dropped.  That closure is connected components.

Implementation: iterative min-label propagation ("hash-to-min" style) —
each round every vertex takes the min label among itself and its
neighbors; converges in O(diameter) rounds.  Each round is one
edge-label join + one groupBy min: all keyed shuffles, no driver-side
graph state, so the same code runs on a 100 TB edge set.  The loop
persists each frontier and unpersists the previous one to keep lineage
and memory flat; convergence is detected with a count of changed labels
(one lightweight action per round).

Determinism: labels are ids and min() is order-insensitive, so the result
is independent of partitioning and join order — oracle-checkable against
a recursive-CTE reachability query.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import tracked_persist, untrack


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a_id",
    dst_col: str = "b_id",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every vertex; cluster_id = min vertex id in the
    component.  Vertices absent from ``edges`` become singletons.

    ``max_iterations`` bounds the propagation (components wider than that
    many hops would need more rounds — raise it for pathological chain
    graphs; real near-dup graphs are dense and converge in a few).  If the
    bound is hit with labels still changing, the result is WRONG (some
    vertices carry a non-minimal label), so a ``RuntimeWarning`` is issued
    rather than returning silently-partial clusters."""
    # undirected: propagate both ways
    fwd = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    sym = tracked_persist(fwd.unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ))

    labels = tracked_persist(vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("cluster_id")
    ))

    # `prev` always points at the PERSISTED frame of the previous round —
    # unpersist must target the cached plan itself, not a projection of it
    prev = labels
    changed = 0
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left_outer")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.col("nbr_min") < F.col("cluster_id")).alias("_changed"),
            )
        )
        updated = tracked_persist(updated)
        changed = updated.filter(F.col("_changed")).count()
        untrack(prev)
        prev = updated
        labels = updated.drop("_changed")
        if changed == 0:
            break

    untrack(sym)
    if changed > 0:
        warnings.warn(
            f"connected_components stopped after {max_iterations} iterations with "
            f"{changed} labels still changing — cluster labels are NOT converged; "
            "raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Full dedup grouping: every doc labeled with its cluster rep and
    whether it is the keeper (the representative survives, duplicates
    drop).  ``pairs`` is any near-dup pair output (a_id, b_id)."""
    cc = connected_components(docs.select(id_col), pairs, id_col=id_col)
    return cc.select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("is_keeper"),
    )
