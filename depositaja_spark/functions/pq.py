"""Product quantization (PQ) ANN tier — the codebook-compressed vector
index (Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor
Search", TPAMI 2011), in the two-stage shape production systems run:

  1. **coarse ADC scan** over the compressed codes: the embedding space
     is split into ``m`` subspaces, each with its own ``ksub``-centroid
     codebook; a vector is stored as m small codes (m bytes at
     ksub ≤ 256 — a 64-dim float32 vector compresses 256 B → 16 B at
     m=16).  Per query, a tiny m×ksub lookup table of exact
     sub-dot-products is precomputed, and a candidate's approximate dot
     product is ``Σ_s LUT[s][code_s]`` — m array lookups, no float
     vector read at scan time;
  2. **exact re-rank** of the top-``rerank`` ADC candidates against
     their full vectors — the final top-k is exact *within* the
     candidate pool, so PQ noise only costs recall when a true
     neighbor misses the (much larger) pool.

Codebooks are trained driver-side on a bounded hash-deterministic
SAMPLE with in-memory k-means — the FAISS convention: codebook training
is tiny-data by design (m·ksub centroids from ≤16 K vectors), while
encoding and scanning, the corpus-sized passes, stay fully distributed
(one Arrow-batched encode; JVM-literal LUT scoring).  At 100 TB the
scan reads m-byte codes instead of d-float vectors (16× less IO here),
and the re-rank touches only |queries|·rerank full vectors.

Reference parity note: the reference wallet engine has no vector ops —
this extends the ANN surface (SURVEY.md extension tier) alongside
brute/SRP-LSH/IVF/int8-SQ in functions/similarity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.similarity import QUERY_IDS, TOP_K, unit_vectors

PQ_M = 16  # subspaces (64-dim → 4 dims each)
PQ_KSUB = 16  # codes per subspace
PQ_SAMPLE = 16384  # max vectors collected for codebook training
PQ_RERANK = 50  # ADC candidates fed to the exact re-rank


def _np_kmeans(x: np.ndarray, k: int, iterations: int, seed: int) -> np.ndarray:
    """Deterministic in-memory k-means++ + Lloyd's (numpy).  Codebook
    training runs on a driver-side sample, so this never sees more than
    PQ_SAMPLE rows."""
    rng = np.random.RandomState(seed)
    n = x.shape[0]
    k = min(k, n)
    # k-means++ seeding
    cents = np.empty((k, x.shape[1]))
    cents[0] = x[rng.randint(n)]
    d2 = ((x - cents[0]) ** 2).sum(axis=1)
    for i in range(1, k):
        probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
        cents[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((x - cents[i]) ** 2).sum(axis=1))
    # Lloyd's
    for _ in range(iterations):
        d = (cents * cents).sum(axis=1)[None, :] - 2.0 * x @ cents.T
        assign = np.argmin(d, axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def pq_train(
    corpus: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iterations: int = 10,
    sample: int = PQ_SAMPLE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks (each ksub × d/m) on a
    hash-deterministic sample.  The sample filter is a row-local
    predicate pushed into the scan (no shuffle); the cut to exactly
    ``sample`` rows keeps the smallest ``(xxhash64(id), id)`` pairs via
    orderBy().limit() — Spark executes that as TakeOrdered (per-partition
    top-k, no global sort) and the winners are a pure function of the
    ids, so the codebooks are bit-identical across re-runs and
    partitionings (an unordered .limit() here was partition-order
    dependent whenever the filter passed more than ``sample`` rows)."""
    total = corpus.count()
    frac_mod = max(1, total // sample)
    rows = (
        corpus.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(frac_mod)) == 0)
        .select(id_col, vec_col, F.xxhash64(F.col(id_col)).alias("_h"))
        .orderBy("_h", id_col)
        .limit(sample)
        .drop("_h")
        .collect()
    )
    rows.sort(key=lambda r: r[0])
    x = np.array([r[1] for r in rows], dtype="float64")
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return [
        _np_kmeans(x[:, s * dsub : (s + 1) * dsub], ksub, iterations, seed=0xD5 + s).tolist()
        for s in range(m)
    ]


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes) with codes[s] = nearest codebook centroid of subvector
    s — ONE Arrow-batched pass over the corpus (all m subspaces encoded
    per batch with numpy matmuls; ties break to the lowest code, which
    np.argmin guarantees)."""
    mats = [np.asarray(b, dtype="float64") for b in books]
    dsub = mats[0].shape[1]

    @F.pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        x = np.stack(vecs.to_numpy())  # B × d
        codes = np.empty((x.shape[0], len(mats)), dtype="int32")
        for s, cb in enumerate(mats):
            sub = x[:, s * dsub : (s + 1) * dsub]  # B × dsub
            # argmin ‖sub − c‖² = argmin (‖c‖² − 2·sub·c)
            d2 = (cb * cb).sum(axis=1)[None, :] - 2.0 * sub @ cb.T
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return corpus.select(F.col(id_col), encode(F.col(vec_col)).alias("codes"))


def pq_ann_topk(
    corpus: DataFrame,
    k: int = TOP_K,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    rerank: int = PQ_RERANK,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Approximate cosine top-k by PQ+ADC with exact re-rank: unit-
    normalize, train codebooks on a sample, encode once, ADC-score every
    candidate as ``Σ_s LUT_q[s][code_s]`` (per-query LUTs inlined as
    literals — pure JVM expression over the codes column), keep the top
    ``rerank`` per query, then re-rank those exactly against their full
    vectors.  Output matches the other ANN tiers:
    (query_id, cand_id, cos, rank).

    ``books`` optionally supplies PINNED codebooks (the deployed-index
    scoring mode, functions/pq_artifact.py) instead of training; ADC
    scores are rounded to 6 before the candidate cut so the pool is
    deterministic across engines and summation orders (ties then break
    on cand_id)."""
    from pyspark.sql import Window as W

    unit = unit_vectors(corpus, id_col, vec_col)
    if books is None:
        books = pq_train(unit, m=m, ksub=ksub, vec_col="unit", id_col=id_col)
    mats = [np.asarray(b) for b in books]
    dsub = mats[0].shape[1]

    encoded = pq_encode(unit, books, vec_col="unit", id_col=id_col)

    qrows = {
        r[0]: np.asarray(r[1])
        for r in unit.filter(F.col(id_col).isin(QUERY_IDS)).select(id_col, "unit").collect()
    }

    per_query = []
    for qid in sorted(qrows):
        qv = qrows[qid]
        # exact sub-dot-products: LUT[s][j] = q_sub_s · codebook[s][j]
        lut = [
            [float(qv[s * dsub : (s + 1) * dsub] @ mats[s][j]) for j in range(len(mats[s]))]
            for s in range(len(mats))
        ]
        lut_col = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
        score = F.aggregate(
            F.zip_with(
                F.lit(list(range(len(mats)))),
                F.col("codes"),
                lambda s, c: F.element_at(F.element_at(lut_col, s + 1), c + 1),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        per_query.append(
            encoded.filter(~F.col(id_col).isin(QUERY_IDS)).select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("cand_id"),
                F.round(score, 6).alias("adc"),
            )
        )
    scored = per_query[0]
    for p in per_query[1:]:
        scored = scored.unionByName(p)
    wc = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    cands = scored.withColumn("crank", F.row_number().over(wc)).filter(
        F.col("crank") <= rerank
    )

    # exact re-rank: only |queries|·rerank full vectors are touched.  The
    # candidate list is the broadcast side (|queries|·rerank rows) — the
    # corpus vector frame is scanned once and semi-filtered by the join.
    # Per-query exact cosine is a chained CASE over the literal query
    # vectors, so the whole re-rank stays JVM-side.
    cvec = unit.select(F.col(id_col).alias("cand_id"), F.col("unit").alias("cv"))
    case = None
    for qid, qv in sorted(qrows.items()):
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
