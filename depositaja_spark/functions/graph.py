"""Connected components over a pair graph — dedup cluster assignment.

Near-dup detection (MinHash-LSH, SimHash, embedding cosine) yields PAIRS;
deduplication needs GROUPS: every document labeled with its cluster
representative (the minimum doc_id reachable through any chain of
near-dup edges), so one keeper per cluster can be chosen and the rest
dropped.  That closure is connected components.

Implementation: iterative min-label propagation ("hash-to-min" style)
with pointer jumping — each round every vertex takes the min label among
itself and its neighbors, then follows that label one hop (path
halving), so convergence is O(log diameter) rounds.  Each round is one
edge⋈label join + one groupBy min + one label⋈label hop: all keyed
shuffles, no driver-side graph state, so the same code runs on a 100 TB
edge set.  Each round ends in ONE job: the convergence metric rides the
checkpoint-materializing action as an Observation, and the
localCheckpoint truncates lineage so Catalyst planning stays O(1) per
round.

The iterative part runs ONLY on vertices incident to an edge: in a
dedup workload the pair graph is orders of magnitude smaller than the
corpus (most documents are unique), so iterating over the full vertex
set would re-shuffle the whole corpus once per round for no reason.
Non-incident vertices are singletons by construction and are unioned
back as ``cluster_id = id`` after convergence — one anti-join, zero
rounds.

Determinism: labels are ids and min() is order-insensitive, so the result
is independent of partitioning and join order — oracle-checkable against
a recursive-CTE reachability query.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import tracked_persist


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
    # pairs feed BOTH union branches of the symmetric edge set — persist
    # first so the (possibly expensive) pair computation materializes
    # once, not once per direction
    edges = tracked_persist(edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")))
    sym = tracked_persist(
        edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    )

    # iterate ONLY on edge-incident vertices (the dup graph); everything
    # else is a singleton and skips the loop entirely
    incident = sym.select(F.col("src").alias("id")).distinct()

    # localCheckpoint TRUNCATES LINEAGE each round.  The round's plan
    # references `labels` twice (neighbor join + left-outer merge), so
    # without truncation the logical tree DOUBLES per iteration —
    # Catalyst planning time, not execution, then dominates (measured: a
    # 225 KB explain string with ~9000 cached-scan nodes after a handful
    # of rounds).  Checkpointing pins the round's rows in executor
    # storage and resets the plan to a leaf, keeping planning O(1) per
    # round.  On a cluster with flaky executors use reliable
    # ``checkpoint()`` (HDFS/object-store) instead — same shape, durable
    # blocks; this is the same discipline GraphFrames' CC uses.
    # Each round's localCheckpoint pins its rows in executor storage; the
    # PREVIOUS round's blocks become garbage the moment the new round is
    # materialized, so they are unpersisted here — otherwise pinned
    # storage grows linearly with rounds within one job (DataFrames give
    # no handle on the checkpointed internal RDD, so retired blocks are
    # found by diffing the context's persistent-RDD set around each
    # checkpoint; rounds are driver-sequential, so the diff is exact).
    sc = vertices.sparkSession.sparkContext

    def _pinned_ids() -> set:
        return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}

    def _unpersist_ids(ids: set) -> None:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)

    # materialize the edge caches BEFORE the first storage snapshot —
    # DataFrame caches register their RDD only on first execution, so
    # without this the diff below would mistake them for round blocks
    # and retire them after round 1 (recomputing pairs every round)
    sym.count()

    before = _pinned_ids()
    labels = incident.select("id", F.col("id").alias("cluster_id")).localCheckpoint()
    prev_ids = _pinned_ids() - before

    changed = 0
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        merged = labels.join(neighbor_min, "id", "left_outer").select(
            "id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
            ).alias("mlbl"),
            F.col("cluster_id").alias("_old"),
        )
        # pointer jumping (path halving): follow the label one hop —
        # mlbl is a vertex id, so its own current label is an equally
        # valid (and ≤) component label.  Chain components then collapse
        # in O(log diameter) rounds instead of O(diameter); every round
        # saved is a full shuffle barrier saved at 100 TB.
        hop = merged.select(F.col("id").alias("jid"), F.col("mlbl").alias("jlbl"))
        new_lbl = F.least(F.col("mlbl"), F.coalesce(F.col("jlbl"), F.col("mlbl")))
        # the convergence metric rides on the SAME action that
        # materializes the checkpoint (Observation ≈ an accumulator), so
        # each round is ONE job, not a materialize + a count
        obs = Observation(f"cc_round_{i}")
        before = _pinned_ids()
        updated = (
            merged.join(hop, merged["mlbl"] == hop["jid"], "left_outer")
            .select("id", new_lbl.alias("cluster_id"), (new_lbl < F.col("_old")).alias("_changed"))
            .observe(obs, F.sum(F.col("_changed").cast("long")).alias("changed"))
            .localCheckpoint()
        )
        changed = int(obs.get["changed"] or 0)
        labels = updated.drop("_changed")
        # the new round is materialized (localCheckpoint is eager), so
        # the previous round's pinned blocks are dead — release them
        _unpersist_ids(prev_ids)
        prev_ids = _pinned_ids() - before
        if changed == 0:
            break

    if changed > 0:
        warnings.warn(
            f"connected_components stopped after {max_iterations} iterations with "
            f"{changed} labels still changing — cluster labels are NOT converged; "
            "raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )

    # singletons: vertices that touch no edge keep their own id.  The
    # incident set is small (it is the dup graph), so the anti-join
    # broadcasts it against the corpus-sized vertex frame.
    singles = (
        vertices.select(F.col(id_col).alias("id"))
        .join(F.broadcast(incident), "id", "left_anti")
        .select("id", F.col("id").alias("cluster_id"))
    )
    return labels.unionByName(singles)


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
