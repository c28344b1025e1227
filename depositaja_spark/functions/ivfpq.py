"""IVF-PQ composed ANN index — the canonical billion-scale vector-search
architecture (FAISS's IVFADC; Jégou et al., TPAMI 2011 §V): an IVF
coarse quantizer prunes the search to ``nprobe`` cells, and residuals
(vector − cell centroid) are product-quantized so the scan inside a
probed cell reads m-byte codes, not floats.

Decomposition that makes ADC work across cells: for a query q and a
candidate x in cell c with residual r = x − centroid(c),

    q·x = q·centroid(c) + q·r ≈ bias(q, c) + Σ_s LUT_q[s][code_s]

``bias`` is a per-(query, probed-cell) scalar computed on the driver
(nprobe numbers per query), and the LUT depends only on the query and
the SHARED residual codebooks — so one m×ksub table per query scores
every candidate in every probed cell.  The plan is: cell equi-join
(broadcast probes) → JVM-literal ADC projection → top-R → exact re-rank,
reusing the PQ tier's pieces.

Scale shape: everything corpus-sized is one pass (cell assignment +
residual encode, a single Arrow-batched projection); the scan side of a
query touches only probed cells (partition pruning once laid out by
cell, see ivf_write_layout) and reads 16 B/vector at m=16; codebooks and
probe tables are driver-side by design, like IVF's centroids.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.pq import PQ_KSUB, PQ_M, PQ_RERANK, pq_encode, pq_train
from depositaja_spark.functions.similarity import (
    NPROBE,
    QUERY_IDS,
    TOP_K,
    _centroid_matrix,
    _ranked_cells_udf,
    unit_vectors,
)
from depositaja_spark.functions.cache import tracked_persist


def _residual_udf(cids: np.ndarray, cents: np.ndarray):
    """(vec, cell) → vec − centroid(cell), Arrow-batched.  Centroids are
    unit-normalized to match the unit-normalized corpus."""
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    index_of = {int(c): i for i, c in enumerate(cids)}

    @F.pandas_udf("array<double>")
    def residual(vecs: pd.Series, cells: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        x = np.stack(vecs.to_numpy())
        rows = cn[[index_of[int(c)] for c in cells]]
        return pd.Series(list(x - rows))

    return residual


def ivfpq_residual_frame(
    corpus: DataFrame,
    nprobe: int = NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """ONE corpus-sized pass shared by the query path and codebook
    (re-)training (functions/ivfpq_artifact.py): unit-normalize, rank
    coarse cells, keep (id, unit, cell, probe_cells, resid) with
    resid = unit − unit_centroid(cell).  Returns (frame, centroid ids,
    centroid matrix) so callers don't re-collect the centroids."""
    unit = unit_vectors(corpus, id_col, vec_col)
    cids, cents = _centroid_matrix(unit, id_col, "unit")
    ranked = _ranked_cells_udf(cids, cents)
    frame = (
        unit.withColumn("cells", ranked(F.col("unit")))
        .select(
            id_col,
            "unit",
            F.col("cells").getItem(0).alias("cell"),
            F.slice(F.col("cells"), 1, nprobe).alias("probe_cells"),
        )
        .withColumn("resid", _residual_udf(cids, cents)(F.col("unit"), F.col("cell")))
    )
    return frame, cids, cents


def ivfpq_ann_topk(
    corpus: DataFrame,
    k: int = TOP_K,
    nprobe: int = NPROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rerank: int = PQ_RERANK,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """IVF-PQ approximate cosine top-k with exact re-rank.  Output
    matches the other ANN tiers: (query_id, cand_id, cos, rank).

    ``books`` optionally supplies PINNED residual codebooks
    (functions/ivfpq_artifact.py — deployed-index scoring mode) instead
    of training; ADC totals are rounded to 6 before the candidate cut
    so the pool is deterministic across engines and summation orders
    (ties then break on cand_id), which is what makes the registered
    query fully oracle-checkable (the coarse quantizer is already
    data-derived from the fixed CENTROID_IDS, SQL-readable as-is)."""
    from pyspark.sql import Window as W

    # ONE corpus-sized pass: cell assignment + residual; encode once.
    frame, cids, cents = ivfpq_residual_frame(corpus, nprobe, id_col, vec_col)
    assigned = tracked_persist(frame)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    index_of = {int(c): i for i, c in enumerate(cids)}
    if books is None:
        books = pq_train(assigned, m=m, ksub=ksub, vec_col="resid", id_col=id_col)
    mats = [np.asarray(b) for b in books]
    dsub = mats[0].shape[1]
    encoded = pq_encode(assigned, books, vec_col="resid", id_col=id_col).join(
        assigned.select(id_col, "cell"), id_col
    )

    qrows = {
        r[0]: (np.asarray(r[1]), [int(c) for c in r[2]])
        for r in assigned.filter(F.col(id_col).isin(QUERY_IDS))
        .select(id_col, "unit", "probe_cells")
        .collect()
    }

    # probe table: (query_id, cell, bias) — nprobe rows per query,
    # biases computed on the driver (q · centroid(cell))
    spark = corpus.sparkSession
    probe_rows = [
        (int(qid), int(c), float(qv @ cn[index_of[c]]))
        for qid, (qv, cells) in sorted(qrows.items())
        for c in cells
    ]
    probes = spark.createDataFrame(probe_rows, "query_id long, cell long, bias double")

    # ADC: per-query LUT over the SHARED residual codebooks; the score is
    # bias + Σ_s LUT[s][code_s], a pure JVM projection over (codes, bias)
    per_query = []
    for qid, (qv, _) in sorted(qrows.items()):
        lut = [
            [float(qv[s * dsub : (s + 1) * dsub] @ mats[s][j]) for j in range(len(mats[s]))]
            for s in range(len(mats))
        ]
        lut_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
        adc = F.aggregate(
            F.zip_with(
                F.lit(list(range(len(mats)))),
                F.col("codes"),
                lambda s, c: F.element_at(F.element_at(lut_col, s + 1), c + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        per_query.append(
            encoded.join(
                F.broadcast(probes.filter(F.col("query_id") == qid)), "cell"
            )
            .filter(F.col(id_col) != F.col("query_id"))
            .select(
                "query_id",
                F.col(id_col).alias("cand_id"),
                F.round(F.col("bias") + adc, 6).alias("adc"),
            )
        )
    scored = per_query[0]
    for p in per_query[1:]:
        scored = scored.unionByName(p)
    wc = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    cands = scored.withColumn("crank", F.row_number().over(wc)).filter(
        F.col("crank") <= rerank
    )

    # exact re-rank (same shape as pq_ann_topk): candidates broadcast,
    # chained per-query literal dot products, JVM-side
    cvec = assigned.select(F.col(id_col).alias("cand_id"), F.col("unit").alias("cv"))
    case = None
    for qid, (qv, _) in sorted(qrows.items()):
        qlit = F.array(*[F.lit(float(v)) for v in qv])
        expr = F.aggregate(
            F.zip_with(qlit, F.col("cv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        case = (
            F.when(F.col("query_id") == qid, expr)
            if case is None
            else case.when(F.col("query_id") == qid, expr)
        )
    wr = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        cvec.join(F.broadcast(cands), "cand_id")
        .select("query_id", "cand_id", F.round(case, 6).alias("cos"))
        .withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= k)
    )
