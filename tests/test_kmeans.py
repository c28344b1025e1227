"""Lloyd's k-means convergence/behavior tests (iterative algorithms have
no SQL oracle — the objective function IS the spec)."""

from __future__ import annotations

from pyspark.sql import functions as F

from depositaja_spark.functions.kmeans import assign_clusters, inertia, kmeans_fit
from depositaja_spark.sources import load_table
from tests.conftest import SF_SMALL


def test_inertia_monotone_and_total_assignment(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").persist()
    n = emb.count()

    seed = [[float(x) for x in r[0]] for r in emb.orderBy("vec_id").select("embedding").limit(8).collect()]
    a0 = assign_clusters(emb, seed)
    j0 = inertia(a0, seed)

    trained = kmeans_fit(emb, k=8, iterations=3)
    a1 = assign_clusters(emb, trained)
    j1 = inertia(a1, trained)

    assert a1.count() == n  # every vector assigned
    assert a1.select("cluster").distinct().count() <= 8
    assert j1 <= j0 * (1 + 1e-9), f"objective increased: {j0} -> {j1}"
    # training actually moves the needle on random-seeded centroids
    assert j1 < j0 * 0.999


def test_separated_clusters_recovered(spark):
    """Two well-separated blobs: k-means must put one centroid in each and
    assignment must match the generating blob exactly."""
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 5) * 0.01, 10.0]))
    for i in range(20, 40):
        rows.append((i, [-10.0, -10.0 - (i % 5) * 0.01]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_fit(emb, k=2, iterations=4)
    got = {
        r.vec_id: r.cluster for r in assign_clusters(emb, cents).collect()
    }
    blob0 = {got[i] for i in range(20)}
    blob1 = {got[i] for i in range(20, 40)}
    assert len(blob0) == 1 and len(blob1) == 1 and blob0 != blob1


def test_assignment_has_no_shuffle_or_sort(spark):
    """assign_clusters is a map-only Arrow matmul: the physical plan must
    contain no Exchange and no Sort (the r1 global orderBy seeding is
    gone)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = [[0.0] * 16 for _ in range(4)]
    for i in range(4):
        cents[i][i] = 1.0
    plan = assign_clusters(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Sort" not in plan


def test_kmeanspp_seed_deterministic_and_spread(spark):
    """Hash-derived k-means++ seeding: reruns are identical, seeds are
    distinct vectors, and on two well-separated blobs the two seeds land
    in different blobs (that is the point of D^2 weighting)."""
    from depositaja_spark.functions.kmeans import kmeanspp_seed

    rows = [(i, [10.0 + (i % 5) * 0.01, 10.0]) for i in range(20)]
    rows += [(i, [-10.0, -10.0 - (i % 5) * 0.01]) for i in range(20, 40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    s1 = kmeanspp_seed(emb, 2)
    s2 = kmeanspp_seed(emb, 2)
    assert s1 == s2
    assert s1[0] != s1[1]
    # one seed per blob: signs of the x coordinate differ
    assert (s1[0][0] > 0) != (s1[1][0] > 0)


def test_seeding_chunked_races_match_unchunked(spark):
    """Race chunking (_RACE_CHUNK) must not change seeding: each race's
    winner depends only on its own hash draw, so chunk boundaries are
    invisible.  Force multi-chunk by shrinking the chunk size and compare
    against the same call at one-chunk size."""
    import depositaja_spark.functions.kmeans as km

    emb = load_table(spark, SF_SMALL, "embeddings").limit(200)
    orig = km._RACE_CHUNK
    try:
        km._RACE_CHUNK = 8  # 28 races at k=8/oversample=4 -> 4 chunks
        chunked = km.kmeanspp_seed(emb, k=8)
        km._RACE_CHUNK = 10_000  # single select
        flat = km.kmeanspp_seed(emb, k=8)
    finally:
        km._RACE_CHUNK = orig
    assert chunked == flat


def test_cluster_sizes_pinned_golden(spark):
    """The registered kmeans_cluster_sizes query scores against the
    PINNED artifact centroids (fully deterministic), so its per-cluster
    membership counts are golden per fixture — a second check alongside
    the round-9 DuckDB argmin oracle.  sf0.01 counts equal the old
    per-run-fit goldens by construction (the artifact IS the sf0.01
    fit's final centroids); sf0.001 counts differ from the old
    locally-fit ones because assignment now uses the shared model."""
    from depositaja_spark import registry

    golden = {
        "/root/testdata/sf0.001": [
            (0, 82), (1, 57), (2, 60), (3, 60), (4, 65), (5, 59), (6, 60), (7, 57)
        ],
        "/root/testdata/sf0.01": [
            (0, 74), (1, 72), (2, 57), (3, 68), (4, 59), (5, 59), (6, 53), (7, 58)
        ],
    }
    for sf_dir, want in golden.items():
        got = [
            (r.cluster, r.n_members)
            for r in registry.QUERIES["kmeans_cluster_sizes"](spark, sf_dir).collect()
        ]
        assert got == want, f"{sf_dir}: {got}"


def test_pinned_assignment_tie_margin(spark):
    """Engine/oracle parity guard for kmeans_cluster_sizes (ADVICE r9):
    the engine scores squared distances via a clamped numpy BLAS matmul
    while the DuckDB oracle sums list_inner_product terms sequentially —
    different FP accumulation orders.  Parity therefore rests on every
    vector's best-vs-second-best d² gap dwarfing accumulation noise
    (~1e-13 relative for 16-dim doubles).  Assert a 1e-6 absolute floor
    on both fixture scales so a future artifact/fixture change that
    introduces a knife-edge assignment fails HERE, not in the driver
    diff."""
    import numpy as np

    from depositaja_spark.functions.kmeans_artifact import KMEANS_CENTROIDS

    cents = np.asarray(KMEANS_CENTROIDS, dtype=np.float64)
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = load_table(spark, sf_dir, "embeddings")
        vecs = np.asarray(
            [r.embedding for r in emb.select("embedding").collect()],
            dtype=np.float64,
        )
        # exact expansion, same for any accumulation order at this scale
        d2 = (
            (vecs * vecs).sum(axis=1, keepdims=True)
            - 2.0 * vecs @ cents.T
            + (cents * cents).sum(axis=1)
        )
        d2.sort(axis=1)
        gap = (d2[:, 1] - d2[:, 0]).min()
        assert gap > 1e-6, f"{sf_dir}: near-tie assignment, min gap {gap}"
