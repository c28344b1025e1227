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


def projection_terms(
    means: list[float], comp, vec_col: str = "embedding", one_based: bool = False
) -> str:
    """The fused multiply-add chain ``Σ (vec[i] − μ_i)·w_i`` as a SQL
    expression string.  ONE generator for the Spark expression
    (0-based array indexing) and its DuckDB oracle twin (1-based list
    indexing) so the two engines always evaluate the identical float64
    op sequence term-for-term — left-associated adds in the same order
    are then bit-identical before any shared rounding."""
    off = 1 if one_based else 0
    return " + ".join(
        f"(CAST({vec_col}[{i + off}] AS DOUBLE) - ({means[i]!r})) * ({float(w)!r})"
        for i, w in enumerate(comp)
    )


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
        terms = projection_terms(means, comp, vec_col)
        projs.append(F.expr(f"round({terms}, {round_to})").alias(f"pc_{c}"))
    return emb.select(id_col, *projs)


def pca_project_sql(
    means: list[float],
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    table: str = "embeddings",
    round_to: int = 4,
) -> str:
    """DuckDB twin of ``pca_project``: the SAME fused multiply-add chain
    term-for-term (so float64 evaluation order is identical and the two
    engines agree bit-for-bit before the shared rounding), with DuckDB's
    1-based list indexing.  Lives next to pca_project so the expression
    pair can never drift apart."""
    projs = []
    for c, comp in enumerate(components):
        terms = projection_terms(means, comp, vec_col, one_based=True)
        projs.append(f"round({terms}, {round_to}) AS pc_{c}")
    cols = ",\n       ".join(projs)
    return f"SELECT {id_col},\n       {cols}\nFROM {table}"


_MOMENT_SCHEMA = "label int, kind int, i int, j int, s double"


def label_moments(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label first and second moments in ONE distributed pass:
    (label, kind, i, j, s) rows where kind 0 = row count (i=j=0),
    kind 1 = per-dimension value sum (i=dim, j=0), kind 2 = uncentered
    Gram sum Σ v_i·v_j.  Each Arrow batch contributes one numpy matmul
    per label present in it; the aggregated frame is L·(1 + d + d²)
    rows — bounded by label cardinality and embedding width, never by
    corpus size (the same bounded-summary contract as
    ``covariance_cells``).  Uncentered moments make the kernel
    mean-free (no broadcast prepass); covariance follows exactly as
    E[vv^T] − μμ^T at the consumer."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, list] = {}
        d_seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            for lab, grp in pdf.groupby(label_col):
                x = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
                d_seen = x.shape[1]
                ent = acc.setdefault(
                    int(lab),
                    [0, np.zeros(d_seen), np.zeros((d_seen, d_seen))],
                )
                ent[0] += len(x)
                ent[1] = ent[1] + x.sum(axis=0)
                ent[2] = ent[2] + x.T @ x
        if not acc:
            return
        d = d_seen
        ii, jj = np.meshgrid(
            np.arange(d, dtype=np.int32), np.arange(d, dtype=np.int32), indexing="ij"
        )
        ii, jj = ii.ravel(), jj.ravel()
        for lab, (n, s1, s2) in acc.items():
            yield pd.DataFrame(
                {
                    "label": np.concatenate(
                        [[lab], np.full(d, lab), np.full(d * d, lab)]
                    ).astype(np.int32),
                    "kind": np.concatenate([[0], np.full(d, 1), np.full(d * d, 2)]).astype(np.int32),
                    "i": np.concatenate([[0], np.arange(d), ii]).astype(np.int32),
                    "j": np.concatenate([[0], np.zeros(d), jj]).astype(np.int32),
                    "s": np.concatenate([[float(n)], s1, s2.ravel()]),
                }
            )

    cells = emb.select(label_col, vec_col).mapInPandas(partials, _MOMENT_SCHEMA)
    return cells.groupBy("label", "kind", "i", "j").agg(F.sum("s").alias("s"))
