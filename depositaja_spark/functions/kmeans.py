"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the iterative-algorithm pattern (train IVF coarse quantizers, cluster
corpora for curriculum/mixture design) expressed Spark-first.

Shape per iteration (the MLlib KMeans rhythm, re-expressed):

  1. assignment — the C×d centroid matrix is broadcast inside an
     Arrow-batched pandas UDF; each batch scores against ALL centroids
     with one numpy matmul (‖x‖² − 2·X·Cᵀ + ‖c‖²) and takes the row-wise
     argmin.  No per-centroid expression unrolling — compile time and
     codegen size stay flat as C·d grows, unlike literal distance
     expressions which explode past a few thousand terms.
  2. update — per-partition partial sums inside mapInPandas (each Arrow
     batch folds to ≤C rows of (cluster, sum-vector, count)), then a
     final tiny shuffle of partials → per-cluster mean.  This is a
     map-side combine done in numpy: the shuffle moves O(partitions × C
     × d) values, NOT the O(N × d) a posexplode-per-element plan moves.

Seeding is **k-means++** (D²-weighted, Arthur & Vassilvitskii 2007) with
no global sort and no driver-side data beyond C×d:

  * centroid 1 = min_by(vec, xxhash64(id)) — a deterministic
    pseudo-random pick via one aggregation;
  * centroid i = exponential-race sample ∝ D²(x): every row draws a
    deterministic uniform u from xxhash64(id, round) and the winner is
    max_by(vec, D²·weight) with weight = 1/−ln(u) — one aggregation per
    round, equivalent to weighted sampling without ever materializing a
    cumulative distribution (the A-Res / Gumbel-race trick).

The driver loop holds only the C×d centroid matrix; lineage is cut per
round by collecting the (tiny) centroids, so the plan does not grow with
iterations.

Determinism: hashes replace rand(), so reruns produce identical seeds;
assignment ties break to the smallest cluster id (np.argmin returns the
first minimum); iteration count is fixed (no data-dependent convergence
test by default) so results are stable up to float-sum partitioning
noise in the means — bounded by tolerance assertions in
tests/test_kmeans.py, not an oracle (iterative fixpoints are not
SQL-expressible; SURVEY.md §5).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dists_to(batch: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Full squared-distance matrix (rows × C) via one matmul."""
    x2 = np.einsum("ij,ij->i", batch, batch)
    c2 = np.einsum("ij,ij->i", cents, cents)
    return np.maximum(x2[:, None] - 2.0 * (batch @ cents.T) + c2[None, :], 0.0)


def assign_clusters(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Attach ``cluster`` = arg-min squared distance (ties → smallest id)
    and ``dist2`` = that distance.  One Arrow-batched matmul per batch
    against the broadcast C×d matrix; no shuffle."""
    cents = np.asarray(centroids, dtype="float64")

    @F.pandas_udf("cluster long, dist2 double")
    def nearest(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"cluster": [], "dist2": []})
        d2 = _dists_to(np.stack(v.to_numpy()).astype("float64"), cents)
        k = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {"cluster": k, "dist2": d2[np.arange(len(k)), k]}
        )

    out = corpus.withColumn("_a", nearest(F.col(vec_col).cast("array<double>")))
    return out.withColumn("cluster", F.col("_a.cluster")).withColumn(
        "dist2", F.col("_a.dist2")
    ).drop("_a")


def update_centroids(assigned: DataFrame, dim: int, vec_col: str = "embedding") -> list[list[float]]:
    """Per-cluster vector mean.  Partial (cluster, Σvec, n) per Arrow
    batch inside mapInPandas — the map-side combine — then the partials
    (O(partitions × C) rows) shuffle once and reduce per dimension.  Only
    the final C×d means reach the driver."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            out_c, out_s, out_n = [], [], []
            for c in np.unique(pdf["cluster"].to_numpy()):
                mask = (pdf["cluster"] == c).to_numpy()
                out_c.append(int(c))
                out_s.append(vecs[mask].sum(axis=0).tolist())
                out_n.append(int(mask.sum()))
            yield pd.DataFrame({"cluster": out_c, "vsum": out_s, "n": out_n})

    part = assigned.select(
        "cluster", F.col(vec_col).cast("array<double>").alias(vec_col)
    ).mapInPandas(partials, "cluster long, vsum array<double>, n long")
    rows = (
        part.select("cluster", "n", F.posexplode("vsum").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(F.sum("x").alias("sx"), F.sum("n").alias("sn"))
        .groupBy("cluster")
        .agg(F.array_agg(F.struct("dim", (F.col("sx") / F.col("sn")).alias("m"))).alias("dims"))
        .collect()
    )
    out: dict[int, list[float]] = {}
    for r in rows:
        vec = [0.0] * dim
        for e in r.dims:
            vec[e.dim] = e.m
        out[r.cluster] = vec
    return [out[k] for k in sorted(out)]


def _uniform_hash(id_col, round_no: int):
    """Deterministic uniform in (0, 1): 52 mantissa-worth bits of
    xxhash64(id, round).  Replaces rand() so seeding is reproducible."""
    h = F.xxhash64(id_col, F.lit(round_no))
    frac = (F.pmod(h, F.lit(1 << 40)).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 40)
    )
    return frac


#: max max_by aggregate expressions per select during seeding — far below
#: Spark's codegen/expression-width cliffs, and small enough that the
#: generated aggregation still whole-stage-compiles
_RACE_CHUNK = 128


def kmeanspp_seed(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    oversample: int = 4,
) -> list[list[float]]:
    """D²-weighted seeding in 1 + ⌈oversample·(k−1)/_RACE_CHUNK⌉ Spark
    jobs (2 jobs up to k≈33, 9 at k=256 — flat in N either way; the
    k-means‖ shape, Bahmani et al. 2012, collapsed to one oversampling
    round).

    The sequential k-means++ chain (centroid i's D² depends on centroids
    1..i−1) costs k jobs; at k=256 IVF-training scale that is 256
    cluster-wide barriers.  Instead:

    1. centroid 1 = min_by(vec, xxhash64(id)) — one aggregation;
    2. ONE aggregation runs ``oversample·(k−1)`` INDEPENDENT exponential
       races against centroid 1: race r's winner is max_by(vec,
       D²/E_r) with E_r = −ln(u_r) a deterministic Exp(1) draw from
       xxhash64(id, r) — each winner is an independent D²-weighted
       sample (A-Res / Gumbel-race, no cumulative weights, no sort);
    3. the ≤ oversample·(k−1) distinct winners (a few KB) are refined
       DRIVER-side by greedy farthest-point traversal — the
       deterministic analog of the sequential k-means++ chain, exact
       over the candidate pool, O(pool²·d) numpy on the driver.

    Races run in chunks of ≤ _RACE_CHUNK aggregates per select — a single
    select with oversample·(k−1) max_by expressions (1020 at k=256) risks
    Spark's codegen/expression-width limits; the scored frame is
    persisted across chunks so each extra chunk costs one aggregation
    over cached partitions, not a rescan (ADVICE r4).

    Quality tradeoff, stated plainly: one oversampling round weights D²
    against centroid 1 only — weaker than multi-round k-means‖ (which
    re-weights against the growing seed set each round); the driver-side
    farthest-point refinement over the winner pool restores most of the
    spread at O(pool²·d) numpy cost, and tests/test_kmeans.py pins the
    resulting inertia against sequential k-means++ on reference data."""
    vecs = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    first = vecs.select(
        F.min_by("_v", F.xxhash64(F.col("_id"))).alias("v")
    ).collect()[0].v
    if first is None:
        raise ValueError("k-means seeding requires a non-empty corpus")
    c0 = [float(x) for x in first]
    if k == 1:
        return [c0]

    n_races = oversample * (k - 1)
    scored = assign_clusters(vecs, [c0], vec_col="_v")
    chunked = n_races > _RACE_CHUNK
    if chunked:
        scored = scored.persist()
    winners: list = []
    try:
        for lo in range(1, n_races + 1, _RACE_CHUNK):
            rs = range(lo, min(lo + _RACE_CHUNK, n_races + 1))
            races = [
                F.max_by(
                    "_v", F.col("dist2") / (-F.log(_uniform_hash(F.col("_id"), r)))
                ).alias(f"w{r}")
                for r in rs
            ]
            row = scored.select(*races).collect()[0]
            winners.extend(row[f"w{r}"] for r in rs)
    finally:
        if chunked:
            scored.unpersist()

    pool: list[list[float]] = []
    seen = {tuple(c0)}
    for v in winners:
        if v is None:
            continue
        tv = tuple(float(x) for x in v)
        if tv not in seen:
            seen.add(tv)
            pool.append(list(tv))

    centroids = [c0]
    if pool:
        pts = np.asarray(pool, dtype="float64")
        d2 = ((pts - np.asarray(c0, dtype="float64")) ** 2).sum(axis=1)
        while len(centroids) < k:
            i = int(np.argmax(d2))
            if d2[i] <= 0.0:
                break  # pool exhausted of distinct points
            centroids.append(pts[i].tolist())
            d2 = np.minimum(d2, ((pts - pts[i]) ** 2).sum(axis=1))
    # degenerate corpora (< k distinct vectors): cycle existing seeds so
    # the contract (len == k) holds, matching the old loop's duplicates
    base, j = len(centroids), 0
    while len(centroids) < k:
        centroids.append(list(centroids[j % base]))
        j += 1
    return centroids


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """k-means++ seeding + Lloyd's iterations.  Returns the trained C×d
    centroid list; feed to ``assign_clusters`` for the final model."""
    centroids = kmeanspp_seed(corpus, k, vec_col, id_col)
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
    over iterations; asserted in tests).  Uses the same matmul scoring as
    assignment so the objective and the assignment agree bit-for-bit."""
    if "dist2" in assigned.columns:
        return assigned.select(F.sum("dist2").alias("s")).collect()[0].s
    rescored = assign_clusters(assigned.drop("cluster"), centroids, vec_col)
    return rescored.select(F.sum("dist2").alias("s")).collect()[0].s


__all__ = [
    "assign_clusters",
    "update_centroids",
    "kmeanspp_seed",
    "kmeans_fit",
    "inertia",
]
