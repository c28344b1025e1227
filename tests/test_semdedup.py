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


def test_pinned_centroid_artifact_provenance(spark):
    """The frozen clustering model (functions/kmeans_artifact.py) must be
    exactly reproducible by the repo's own distributed fit over its
    recorded fit corpus — literals can never drift from the machinery."""
    from depositaja_spark.functions.kmeans import kmeans_fit
    from depositaja_spark.functions.kmeans_artifact import (
        KMEANS_CENTROIDS,
        KMEANS_ITERATIONS,
        KMEANS_K,
    )
    from depositaja_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    cents = kmeans_fit(emb, KMEANS_K, KMEANS_ITERATIONS)
    assert [[float(x) for x in c] for c in cents] == KMEANS_CENTROIDS


def test_pinned_centroids_skip_the_fit_and_match_bruteforce(spark, emb):
    """semdedup(centroids=...) must score against the given model (no
    re-fit) and its keep decisions must equal the brute-force keep rule
    over the pinned assignment."""
    import itertools
    import math

    from depositaja_spark.functions.kmeans_artifact import KMEANS_CENTROIDS

    out = {
        r.vec_id: (r.cluster, r.keep)
        for r in semdedup(emb, threshold=0.4, centroids=KMEANS_CENTROIDS).collect()
    }
    rows = {r.vec_id: [float(x) for x in r.embedding] for r in emb.collect()}

    def nearest(v):
        best, bd = None, None
        for c, w in enumerate(KMEANS_CENTROIDS):
            d = sum((a - b) * (a - b) for a, b in zip(v, w))
            if bd is None or d < bd:
                best, bd = c, d
        return best

    asg = {i: nearest(v) for i, v in rows.items()}
    assert {i: c for i, (c, _) in out.items()} == asg
    unit = {
        i: [x / math.sqrt(sum(y * y for y in v)) for x in v]
        for i, v in rows.items()
    }
    dropped = set()
    for a, b in itertools.combinations(sorted(rows), 2):
        if asg[a] == asg[b]:
            cos = round(sum(x * y for x, y in zip(unit[a], unit[b])), 6)
            if cos >= 0.4:
                dropped.add(b)
    assert {i for i, (_, k) in out.items() if not k} == dropped


def test_sqrt_cells_keep_rule_matches_bruteforce(spark):
    """semdedup_sqrt_cells (the r10 scale path for the pinned-model
    query) must satisfy the semdedup keep rule within ITS cells: a
    vector is dropped iff some lower-id same-cell vector has rounded
    cosine >= tau — verified by a pure-Python brute force over the
    collected assignment."""
    import math

    from depositaja_spark import registry
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    out = {
        r.vec_id: (r.cell, r.keep)
        for r in registry.QUERIES["semdedup_sqrt_cells"](spark, sf).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf, "embeddings").collect()
    }
    release_caches()
    assert len(out) == len(vecs)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    units = {i: unit(v) for i, v in vecs.items()}
    by_cell: dict = {}
    for i, (cell, _k) in out.items():
        by_cell.setdefault(cell, []).append(i)
    for cell, members in by_cell.items():
        members.sort()
        for idx, b in enumerate(members):
            want_drop = any(
                round(sum(x * y for x, y in zip(units[a], units[b])), 6) >= 0.4
                for a in members[:idx]
            )
            assert out[b][1] == (not want_drop), (cell, b)


def test_sqrt_cells_clone_collapses(spark, tmp_path):
    """An exact clone of an existing vector lands in the same cell
    (identical rounded cosines, same tie-break) and is dropped — the
    dedup guarantee the partition must never break."""
    import pandas as pd

    from depositaja_spark import registry
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.sources import load_table

    base = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .limit(200)
        .toPandas()
    )
    clone = base.iloc[[5]].copy()
    clone["vec_id"] = 99_999
    pd.concat([base, clone]).to_parquet(tmp_path / "embeddings.parquet")
    out = {
        r.vec_id: r
        for r in registry.QUERIES["semdedup_sqrt_cells"](
            spark, str(tmp_path)
        ).collect()
    }
    release_caches()
    assert out[99_999].cell == out[5].cell
    assert out[5].keep and not out[99_999].keep


def test_all_pairs_baselines_refuse_oversized_inputs(spark):
    """Verdict r10: the two labeled O(N²) recall baselines must enforce
    their fixture-scale contract in code — raise with a pointer to the
    registered scale sibling instead of silently launching a quadratic
    job (SCALING.md's prose contract, made executable)."""
    import pytest
    from pyspark.sql import functions as F

    from depositaja_spark.functions.similarity import hard_negative_pairs

    big = spark.range(0, 150_000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        (F.col("id") % 2).alias("label"),
    )
    with pytest.raises(ValueError, match="semdedup_cells2"):
        semdedup(big, k=2, iterations=1)
    with pytest.raises(ValueError, match="hard_negative_pairs_ivf2"):
        hard_negative_pairs(big)
    # the banded near-dup's guard names the real knob (the threshold):
    # its loose fixture criterion is output-bound quadratic (r11 sf10
    # finding — disk-killed at 200k vectors before the guard existed)
    from depositaja_spark.functions.similarity import embedding_near_dup_banded

    with pytest.raises(ValueError, match="cos >= 0.9"):
        embedding_near_dup_banded(big.drop("label"))
    # max_rows=None restores the deliberate oversized-baseline escape
    # hatch (plan-only check: no action is triggered here)
    semdedup(big.limit(10), k=2, iterations=1, max_rows=None)


def test_cells2_keep_rule_matches_bruteforce(spark):
    """semdedup_cells2 (the r11 N^(4/3) successor) must satisfy the
    semdedup keep rule within ITS (cell, sub) buckets: a vector is
    dropped iff some lower-id same-bucket vector has rounded cosine
    >= tau (the registered query's tau = 0.4) — verified by a
    pure-Python brute force over the collected two-level assignment."""
    import math

    from depositaja_spark import registry
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    out = {
        r.vec_id: (r.cell, r.sub, r.keep)
        for r in registry.QUERIES["semdedup_cells2"](spark, sf).collect()
    }
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf, "embeddings").collect()
    }
    release_caches()
    assert len(out) == len(vecs)

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    units = {i: unit(v) for i, v in vecs.items()}
    by_bucket: dict = {}
    for i, (cell, sub, _k) in out.items():
        by_bucket.setdefault((cell, sub), []).append(i)
    n_dropped = 0
    for i, (cell, sub, keep) in out.items():
        hit = any(
            round(sum(a * b for a, b in zip(units[j], units[i])), 6) >= 0.4
            for j in by_bucket[(cell, sub)]
            if j < i
        )
        assert keep == (not hit), (i, cell, sub)
        n_dropped += int(hit)
    assert n_dropped > 0  # the fixture must actually exercise the rule


def test_cells2_clone_collapses(spark, tmp_path):
    """An exact clone lands in the same (cell, sub) bucket at BOTH
    quantizer levels (identical rounded cosines, same tie-breaks) and
    is dropped — deeper quantization must never break the exact-dup
    guarantee."""
    from depositaja_spark import registry
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.sources import load_table

    base = (
        load_table(spark, "/root/testdata/sf0.001", "embeddings")
        .limit(200)
        .collect()
    )
    rows = [(r.vec_id, r.embedding, r.label) for r in base]
    # clone vector 50 under a fresh high id
    clone_src = next(r for r in rows if r[0] == 50)
    rows.append((10_000, clone_src[1], clone_src[2]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = tmp_path / "emb2"
    d.mkdir()
    df.coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    out = {
        r.vec_id: (r.cell, r.sub, r.keep)
        for r in registry.QUERIES["semdedup_cells2"](spark, str(d)).collect()
    }
    release_caches()
    assert out[10_000][:2] == out[50][:2]  # same bucket at both levels
    assert out[50][2] is True and out[10_000][2] is False


def test_single_level_paths_demoted_to_mid_scale_baselines(spark):
    """Verdict r11 #1: the single-level sqrt-N paths measured x52.5 /
    x12.1 under 10x data at sf10 while their two-level successors
    measured x14.1 / x7.8 — so they are mid-scale baselines now, not
    'the SCALE PATH'.  Pin the demotion: (a) the in-code guard refuses
    oversized inputs with a pointer to the two-level successor, (b)
    max_rows=None keeps the deliberate-baseline escape hatch, and (c)
    the docstrings carry the successor's name so a user reading help()
    finds the scale path."""
    import pytest
    from pyspark.sql import functions as F

    from depositaja_spark.functions.similarity import (
        hard_negative_pairs_ivf,
        semdedup_sqrt_cells,
    )

    big = spark.range(0, 600_001).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        (F.col("id") % 2).alias("label"),
    )
    with pytest.raises(ValueError, match="hard_negative_pairs_ivf2"):
        hard_negative_pairs_ivf(big)
    with pytest.raises(ValueError, match="semdedup_cells2"):
        semdedup_sqrt_cells(big.drop("label"))
    # escape hatch stays (20 rows so the id>=10 centroid range is
    # non-empty; the centroid collect is eager)
    semdedup_sqrt_cells(big.limit(20), max_rows=None)
    # the docstring guidance is part of the contract
    for fn in (semdedup_sqrt_cells, hard_negative_pairs_ivf):
        doc = " ".join(fn.__doc__.split())
        assert "MID-SCALE BASELINE" in doc
    assert "semdedup_cells2" in semdedup_sqrt_cells.__doc__
    assert "hard_negative_pairs_ivf2" in hard_negative_pairs_ivf.__doc__


def test_decontaminate_semantic_guard_and_fixed_sibling(spark):
    """r12 sf10 finding: decontaminate_semantic's output grew ×97 under
    10× data (both join sides scale with the corpus; τ=0.35 passes
    ~0.06% of random cross pairs) — output-bound quadratic, the same
    class as embedding_near_dup_banded.  Pin the in-code guard and that
    the registered linear sibling agrees with the quadratic variant on
    the pairs they both score (the fixed benchmark is a SUBSET of the
    scaled one, scored exactly, so every fixed-variant hit whose cosine
    the bucketed variant's candidate join also surfaces must carry the
    identical rounded cosine)."""
    import pytest

    from depositaja_spark import registry

    big_n = 150_000
    from pyspark.sql import functions as F

    # guard fires past 100k embedding rows, naming the sibling
    orig_emb = registry.QUERIES["decontaminate_semantic"]
    import depositaja_spark.queries_ext as qe

    big_dir_stub = spark.range(0, big_n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    orig = qe._emb
    qe._emb = lambda s, d: big_dir_stub
    try:
        with pytest.raises(ValueError, match="decontaminate_semantic_fixed"):
            registry.QUERIES["decontaminate_semantic"](spark, "ignored")
    finally:
        qe._emb = orig

    sf = "/root/testdata/sf0.001"
    fixed = {
        (r.vec_id, r.bench_id): r.cos
        for r in registry.QUERIES["decontaminate_semantic_fixed"](
            spark, sf
        ).collect()
    }
    scaled = {
        (r.vec_id, r.bench_id): r.cos
        for r in registry.QUERIES["decontaminate_semantic"](spark, sf).collect()
    }
    shared = set(fixed) & set(scaled)
    assert all(fixed[k] == scaled[k] for k in shared)
    # exactness: the fixed variant scores ALL corpus×bench pairs, so it
    # can only find MORE hits against its benchmark subset than the
    # bucket-pruned variant does
    bench_ids = {b for _, b in fixed}
    assert {k for k in scaled if k[1] in bench_ids} <= set(fixed)
