"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the iterative-algorithm pattern (train IVF coarse quantizers, cluster
corpora for curriculum/mixture design) expressed in pure DataFrame ops.

Each iteration is two keyed shuffles over N·d values:

  1. assignment — centroids are a handful of rows → broadcast as literal
     column expressions; arg-min distance is a compile-time loop of C
     squared-distance expressions (no UDF, stays in codegen);
  2. update — per-dimension mean via posexplode(vector) → groupBy
     (cluster, dim) avg → array re-assembly with array_agg sorted by dim.

The loop lives on the driver but holds only the C×d centroid matrix —
data never leaves the cluster; lineage is cut per round by collecting
the (tiny) centroids, so the plan does not grow with iterations.  This
is the standard scale shape: Spark MLlib's KMeans does exactly this with
the same broadcast-assign/aggregate-update rhythm.

Determinism: ties in assignment break to the smallest cluster id;
iteration count is fixed (no data-dependent convergence test by default)
so reruns produce identical results up to float-sum partitioning noise in
the means — bounded by tolerance assertions in tests/test_kmeans.py, not
an oracle (iterative fixpoints are not SQL-expressible; SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist(vec, centroid: list[float]):
    """Σ (v_i − c_i)² with the centroid unrolled as literals — one flat
    codegen'd expression per centroid."""
    acc = F.lit(0.0)
    for i, c in enumerate(centroid):
        d = F.element_at(vec, i + 1).cast("double") - F.lit(c)
        acc = acc + d * d
    return acc


def assign_clusters(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``cluster`` = arg-min squared distance (ties → smallest id).
    C compile-time distance expressions; no shuffle."""
    scores = F.array(
        *[
            F.struct(
                _sq_dist(F.col(vec_col), c).alias("d"),
                F.lit(k).cast("long").alias("k"),
            )
            for k, c in enumerate(centroids)
        ]
    )
    best = F.array_min(scores)  # struct min: smallest distance, then smallest id
    return corpus.withColumn("cluster", best["k"])


def update_centroids(assigned: DataFrame, dim: int, vec_col: str = "embedding") -> list[list[float]]:
    """Per-cluster vector mean via posexplode → (cluster, dim) avg →
    re-assembled driver-side (C×d values — the only data that ever reaches
    the driver)."""
    rows = (
        assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .groupBy("cluster")
        .agg(F.array_agg(F.struct("dim", "m")).alias("dims"))
        .collect()
    )
    out: dict[int, list[float]] = {}
    for r in rows:
        vec = [0.0] * dim
        for e in r.dims:
            vec[e.dim] = e.m
        out[r.cluster] = vec
    return [out[k] for k in sorted(out)]


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Lloyd's iterations from a deterministic seed (the first k vectors by
    id — swap for k-means++ sampling at real scale).  Returns the trained
    C×d centroid list; feed to ``assign_clusters`` for the final model."""
    seed_rows = (
        corpus.orderBy(id_col).select(vec_col).limit(k).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in seed_rows]
    dim = len(centroids[0])
    for _ in range(iterations):
        assigned = assign_clusters(corpus, centroids, vec_col)
        new = update_centroids(assigned, dim, vec_col)
        # a cluster can lose all members; keep its old centroid
        if len(new) < len(centroids):
            have = set(
                r.cluster
                for r in assigned.select("cluster").distinct().collect()
            )
            merged = []
            j = 0
            for ki in range(len(centroids)):
                if ki in have:
                    merged.append(new[j])
                    j += 1
                else:
                    merged.append(centroids[ki])
            new = merged
        centroids = new
    return centroids


def inertia(assigned: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> float:
    """Σ min-distance² — the Lloyd's objective (monotone non-increasing
    over iterations; asserted in tests)."""
    per_row = None
    for kk, c in enumerate(centroids):
        d = _sq_dist(F.col(vec_col), c)
        expr = F.when(F.col("cluster") == kk, d)
        per_row = expr if per_row is None else F.coalesce(per_row, expr)
    return assigned.select(F.sum(per_row).alias("s")).collect()[0].s
