"""Distributed PCA over an embedding column.

The dimensionality-reduction step of an embedding pipeline (whitening
before clustering, 2-D corpus maps, variance diagnostics).  The design
is the classic two-phase "summarize-then-solve" split that keeps the
big data big and the linear algebra small:

1. **Covariance accumulation is distributed and bounded**: each Arrow
   batch contributes a d×d partial Gram matrix of the mean-centered
   vectors (one ``numpy`` matmul per batch via ``mapInPandas`` — bytes
   never become Python row objects), emitted as (i, j, partial-sum)
   rows.  A single aggregation keyed by (i, j) sums the partials; the
   shuffled state is O(partitions · d²), INDEPENDENT of row count — at
   100 TB this is a few thousand doubles per partition, not data.
2. **The eigensolve is a driver-side d×d problem**: d² covariance cells
   (d=64 → 4 KB) are collected and handed to ``numpy.linalg.eigh`` —
   the only collect in the family, bounded by the embedding width by
   construction, never by the corpus.
3. **Projection is JVM-side generated SQL**: each principal component
   becomes one ``F.expr`` of d fused multiply-adds over the (centered)
   embedding — whole-stage codegen, no Python in the per-row path, no
   shuffle at all (the projection is embarrassingly row-local).

Eigenvector sign is fixed deterministically (the largest-|weight|
entry of each component is made positive) so repeated runs and the
pytest numpy-parity check agree bit-for-bit up to float rounding.

Mean computation note: the per-dimension means ARE collected into the
mapInPandas closure — d doubles, the same bounded-summary pattern as
kmeans centroids and IVF probe cells (SCALING.md's "small by
construction" list).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = "i int, j int, s double"


def dim_means(emb: DataFrame, vec_col: str = "embedding") -> list[float]:
    """Per-dimension means, as a plain list (d doubles).  One posexplode
    + one aggregation keyed by the (fixed-domain, ≤ d) dimension index;
    the collect is bounded by the embedding width."""
    rows = (
        emb.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("mu"))
        .collect()
    )
    mu = [0.0] * len(rows)
    for r in rows:
        mu[r["dim"]] = float(r["mu"])
    return mu


def covariance_cells(
    emb: DataFrame, vec_col: str = "embedding", means: list[float] | None = None
) -> DataFrame:
    """(i, j, cov): the population covariance matrix as a d² cell frame.

    Per-batch centered Gram matmul → (i, j, partial) rows → one sum
    keyed by (i, j).  Shuffle volume is O(partitions · d²) regardless
    of corpus size; every float accumulates in float64."""
    mu_list = dim_means(emb, vec_col) if means is None else means
    mu = np.asarray(mu_list, dtype=np.float64)
    d = len(mu_list)
    n = emb.count()
    ii, jj = np.meshgrid(np.arange(d, dtype=np.int32), np.arange(d, dtype=np.int32), indexing="ij")
    ii, jj = ii.ravel(), jj.ravel()

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((d, d), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mu
            acc += x.T @ x
            seen = True
        if seen:
            yield pd.DataFrame({"i": ii, "j": jj, "s": acc.ravel()})

    cells = emb.select(vec_col).mapInPandas(partials, _PARTIAL_SCHEMA)
    return (
        cells.groupBy("i", "j")
        .agg((F.sum("s") / F.lit(float(n))).alias("cov"))
    )


def _fix_signs(vecs: np.ndarray) -> np.ndarray:
    """Columns are eigenvectors; flip each so its largest-|entry| is
    positive (first such index on ties) — the deterministic convention
    both the operator and the parity tests rely on."""
    out = vecs.copy()
    for c in range(out.shape[1]):
        k = int(np.argmax(np.abs(out[:, c])))
        if out[k, c] < 0:
            out[:, c] = -out[:, c]
    return out


def pca_fit(
    emb: DataFrame, k: int, vec_col: str = "embedding"
) -> tuple[list[float], np.ndarray, np.ndarray]:
    """(means, components[k×d], explained_variance[k]) — top-k principal
    axes.  The eigensolve sees only the d×d covariance (driver-side
    numpy.eigh; symmetric, so eigh not svd)."""
    means = dim_means(emb, vec_col)
    d = len(means)
    cell_rows = covariance_cells(emb, vec_col, means=means).collect()
    cov = np.zeros((d, d), dtype=np.float64)
    for r in cell_rows:
        cov[r["i"], r["j"]] = r["cov"]
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = _fix_signs(v[:, order])  # d×k
    return means, comps.T, w[order]


def pca_project(
    emb: DataFrame,
    means: list[float],
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Project each vector onto the given components → (id, pc_0..pc_{k-1}).

    One generated-SQL fused multiply-add chain per component (d terms),
    fully inside whole-stage codegen — row-local, shuffle-free.  Output
    rounded so downstream hash compares are stable across partial-sum
    orderings."""
    projs = []
    for c, comp in enumerate(components):
        terms = " + ".join(
            f"(CAST({vec_col}[{i}] AS DOUBLE) - ({means[i]!r})) * ({float(w)!r})"
            for i, w in enumerate(comp)
        )
        projs.append(F.expr(f"round({terms}, {round_to})").alias(f"pc_{c}"))
    return emb.select(id_col, *projs)
