"""SemDeDup (functions/similarity.py:semdedup): keep-rule parity against
a brute-force Python replica, structural invariants, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from depositaja_spark.functions.kmeans import assign_clusters, kmeans_fit
from depositaja_spark.functions.similarity import semdedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


def _python_keep(rows, clusters, threshold):
    """rows: {id: np.ndarray}; clusters: {id: cluster}.  A vector is
    dropped iff a lower-id same-cluster vector has cosine ≥ τ."""
    keep = {}
    by_cluster: dict[int, list[int]] = {}
    for vid in sorted(rows):
        by_cluster.setdefault(clusters[vid], []).append(vid)
    for members in by_cluster.values():
        for i, b in enumerate(members):
            dropped = False
            for a in members[:i]:
                ua = rows[a] / np.linalg.norm(rows[a])
                ub = rows[b] / np.linalg.norm(rows[b])
                if round(float(ua @ ub), 6) >= threshold:
                    dropped = True
                    break
            keep[b] = not dropped
    return keep


@pytest.mark.parametrize("threshold", [0.9, 0.99])
def test_matches_bruteforce_replica(spark, emb, threshold):
    got = {
        r.vec_id: (r.cluster, r.keep)
        for r in semdedup(emb, k=4, iterations=2, threshold=threshold).collect()
    }
    # replicate with the SAME deterministic centroids the operator trains
    cents = kmeans_fit(emb, k=4, iterations=2)
    clusters = {
        r.vec_id: r.cluster for r in assign_clusters(emb, cents).collect()
    }
    rows = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()
    }
    want = _python_keep(rows, clusters, threshold)
    assert {v: c for v, (c, _) in got.items()} == clusters
    assert {v: k for v, (_, k) in got.items()} == want


def test_every_vector_gets_a_decision(spark, emb):
    out = semdedup(emb, k=4, iterations=2, threshold=0.9)
    assert out.count() == emb.count()
    assert out.filter(out.keep.isNull()).count() == 0


def test_lowest_id_of_any_dup_group_is_kept(spark):
    """Three exact duplicates + one distinct vector: only the lowest id
    of the dup trio survives, the distinct one always survives."""
    v = [0.6, 0.8]
    w = [-0.8, 0.6]
    df = spark.createDataFrame(
        [(1, v), (2, v), (3, v), (4, w)], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r.keep for r in semdedup(df, k=2, iterations=2, threshold=0.99).collect()}
    assert got[1] is True and got[4] is True
    assert got[2] is False and got[3] is False


def test_deterministic_across_runs(spark, emb):
    a = sorted(
        (r.vec_id, r.cluster, r.keep)
        for r in semdedup(emb, k=4, iterations=2, threshold=0.9).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.keep)
        for r in semdedup(emb, k=4, iterations=2, threshold=0.9).collect()
    )
    assert a == b
