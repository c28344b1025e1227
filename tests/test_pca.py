"""PCA (functions/pca.py): numpy parity for every phase, sign
determinism, and the bounded-summary contract."""

from __future__ import annotations

import numpy as np
import pytest

from depositaja_spark.functions import pca

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows]), [
        r.vec_id for r in rows
    ]


def test_dim_means_match_numpy(emb, X):
    x, _ = X
    got = np.asarray(pca.dim_means(emb))
    assert np.allclose(got, x.mean(axis=0), atol=1e-9)


def test_covariance_matches_numpy(emb, X):
    x, _ = X
    d = x.shape[1]
    cells = pca.covariance_cells(emb).collect()
    got = np.zeros((d, d))
    for r in cells:
        got[r["i"], r["j"]] = r["cov"]
    want = np.cov(x, rowvar=False, bias=True)
    assert np.allclose(got, want, atol=1e-9)
    assert np.allclose(got, got.T, atol=1e-12), "covariance must be symmetric"


def test_fit_matches_numpy_eigh(emb, X):
    x, _ = X
    means, comps, ev = pca.pca_fit(emb, k=3)
    want_cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(want_cov)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(ev, w[order], atol=1e-8)
    for c in range(3):
        ref = v[:, order[c]]
        k = int(np.argmax(np.abs(ref)))
        if ref[k] < 0:
            ref = -ref
        assert np.allclose(comps[c], ref, atol=1e-6)


def test_projection_matches_numpy(emb, X):
    x, ids = X
    means, comps, _ = pca.pca_fit(emb, k=2)
    got = {
        r.vec_id: (r.pc_0, r.pc_1)
        for r in pca.pca_project(emb, means, comps).collect()
    }
    want = (x - np.asarray(means)) @ np.asarray(comps).T
    for i, vid in enumerate(ids):
        assert got[vid] == pytest.approx(tuple(np.round(want[i], 4)), abs=2e-4)


def test_sign_convention_is_deterministic():
    v = np.array([[0.6, -0.8], [-0.8, -0.6]])
    fixed = pca._fix_signs(v)
    # column 0: largest |entry| is row 1 (−0.8) → flipped
    assert fixed[1, 0] > 0
    # column 1: largest |entry| is row 0 (−0.8) → flipped
    assert fixed[0, 1] > 0


def test_projection_is_shuffle_free(emb):
    import contextlib
    import io

    means, comps, _ = pca.pca_fit(emb, k=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pca.pca_project(emb, means, comps).explain("formatted")
    assert "Exchange" not in buf.getvalue(), "projection must be row-local"


def test_empty_input(spark):
    e = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert pca.covariance_cells(e).count() == 0


def test_pinned_artifact_provenance(spark):
    """The frozen PCA model (functions/pca_artifact.py) must be exactly
    reproducible by the repo's own distributed fit over its recorded
    fit corpus (sf0.01) — so the literals can never silently drift from
    the fit machinery they claim to come from."""
    from depositaja_spark.functions.pca_artifact import PCA_COMPONENTS, PCA_MEANS
    from depositaja_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    means, comps, _ = pca.pca_fit(emb, k=4)
    assert means == PCA_MEANS
    # components: near-exact, not bitwise — np.linalg.eigh dispatches
    # CPU-specific LAPACK kernels, and a VM migration changed the last
    # ulps of the eigenvectors (measured 7.7e-15 max drift, deterministic
    # within a host, means still bitwise equal).  1e-12 is six orders
    # above that noise and far below any real provenance drift.
    assert np.allclose(comps, np.asarray(PCA_COMPONENTS), atol=1e-12, rtol=0)


def test_label_moments_match_numpy(spark):
    """One-pass per-label moment accumulation (count, Σv, Σvv^T) must
    equal a per-label numpy recomputation, including labels split
    across partitions and Arrow batches."""
    import numpy as np

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(size=4)], int(i % 3)) for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(7)
    got = {}
    for r in pca.label_moments(emb).collect():
        got[(r["label"], r["kind"], r["i"], r["j"])] = r["s"]
    x = np.array([np.asarray(v, dtype=np.float32).astype(np.float64) for _, v, _ in rows])
    labs = np.array([l for _, _, l in rows])
    for lab in (0, 1, 2):
        xl = x[labs == lab]
        assert got[(lab, 0, 0, 0)] == float(len(xl))
        s1 = xl.sum(axis=0)
        s2 = xl.T @ xl
        for i in range(4):
            assert got[(lab, 1, i, 0)] == pytest.approx(float(s1[i]), rel=1e-12)
            for j in range(4):
                assert got[(lab, 2, i, j)] == pytest.approx(float(s2[i, j]), rel=1e-12)
