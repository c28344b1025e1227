"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring production ANN practice:

* brute-force cosine top-k — the exact baseline; a broadcast of the query
  set against a full scan of the corpus.  O(N·Q·d) but embarrassingly
  parallel and often the right answer when Q is small.
* LSH-bucketed ANN — sign-random-projection buckets shrink the candidate
  set; at 100 TB the bucket join replaces the full scan with a keyed
  shuffle.  Anchors are taken deterministically from the corpus itself so
  the DuckDB oracle can reproduce bucketing exactly.

Arithmetic is element-cast-to-double before multiply so Spark, DuckDB,
and the Arrow fast path agree to rounding precision.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import tracked_persist

#: vec_ids used as query vectors in the demo queries
QUERY_IDS = [0, 1, 2, 3, 4]
#: vec_ids whose embeddings serve as LSH anchor hyperplanes
ANCHOR_IDS = [5, 6, 7]
TOP_K = 5


def _guard_all_pairs_baseline(
    corpus: DataFrame, max_rows: int | None, name: str, sibling: str
) -> None:
    """Enforce the fixture-scale contract of the labeled O(N²) recall
    baselines IN CODE, not prose: refuse inputs past ``max_rows`` with
    a pointer to the registered scale-path sibling (SCALING.md records
    the measured ratios).  One bounded count job — these baselines are
    excluded from the headline bench, so the extra scan is free where
    they are allowed to run at all."""
    if max_rows is None:
        return
    n = corpus.count()
    if n > max_rows:
        raise ValueError(
            f"{name} is the exact all-pairs recall baseline (O(N²)) and is "
            f"capped at {max_rows} input rows; got {n}.  Use the scale-path "
            f"sibling {sibling} at this size, or pass max_rows=None for a "
            f"deliberate oversized baseline run."
        )


def _guard_mid_scale_baseline(
    n: int, max_rows: int | None, name: str, sibling: str
) -> None:
    """Enforce the mid-scale contract of the SUPERSEDED single-level
    √N-cell paths in code (r11 verdict #1): both are O(N·√N) by design
    and the r11 sf10 decade measured them strictly dominated by their
    two-level O(N^(4/3)) successors (×52.5 vs ×14.1 mining, ×12.1 vs
    ×7.8 semdedup; crossover ≈ sf3 — SCALE_SPOT_r11.jsonl), so a user
    at real scale picking the single-level name by accident should get
    a refusal naming the right sibling, not a silently slow job.  The
    500k default admits every fixture up to the sf10 spot dirs (200k
    embeddings) and refuses at roughly the measured crossover's next
    decade; ``max_rows=None`` escapes for deliberate baseline runs."""
    if max_rows is None:
        return
    if n > max_rows:
        raise ValueError(
            f"{name} is the single-level mid-scale baseline (O(N·√N), "
            f"superseded at ≥sf3 — SCALE_SPOT_r11.jsonl) and is capped at "
            f"{max_rows} input rows; got {n}.  Use the two-level successor "
            f"{sibling} at this size, or pass max_rows=None for a "
            f"deliberate oversized baseline run."
        )


def _dvec(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate — JVM-side, no UDF."""
    return F.aggregate(
        F.zip_with(_dvec(a), _dvec(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dvec(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries is expected to be small → broadcast; ranking is per-query via
    window with rounded-cosine + id tie-break so results are total-ordered
    and engine-independent.
    """
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def cosine_topk_filtered(
    corpus: DataFrame,
    queries: DataFrame,
    filter_col: str,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Metadata-filtered exact top-k: each query ranks only candidates
    sharing its ``filter_col`` value (same-language retrieval, same-split
    dedup probes, tenant isolation — the standard "filtered ANN" shape).

    The predicate becomes the JOIN KEY of a broadcast hash join instead
    of a post-filter on the cross product: candidates with non-matching
    metadata are dropped before any vector math, and at scale Catalyst
    additionally pushes the broadcast-side value set toward the scan.
    Ranking/tie-break conventions are identical to cosine_topk."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(filter_col).alias("_f"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        F.col(filter_col).alias("_f"),
    )
    scored = (
        c.join(F.broadcast(q), "_f")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def srp_bucket(vec: Column, anchors: list[Column]) -> Column:
    """Sign-random-projection bucket id: bit i = [dot(vec, anchor_i) > 0]."""
    bucket = F.lit(0)
    for i, a in enumerate(anchors):
        # sign taken on the rounded dot so engines with different summation
        # order can't disagree exactly at the hyperplane boundary
        bucket = bucket + F.when(F.round(dot(vec, a), 6) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def with_srp_buckets(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Attach the SRP bucket computed against the deterministic anchor
    vectors (rows ANCHOR_IDS of the corpus itself — reproducible without
    any RNG, and oracle-expressible)."""
    anchors_rows = (
        corpus.filter(F.col(id_col).isin(ANCHOR_IDS))
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    anchors = [F.array(*[F.lit(float(x)) for x in r[0]]) for r in anchors_rows]
    return corpus.withColumn("bucket", srp_bucket(F.col(vec_col), anchors))


def ann_topk_lsh(
    corpus: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket.

    The bucket equi-join replaces the cross join — at scale this is a
    keyed shuffle whose fan-in per bucket is N/2^bits, tunable by adding
    anchors.  Recall loss vs cosine_topk is measured in the tests."""
    from pyspark.sql import Window as W

    bucketed = with_srp_buckets(corpus, id_col, vec_col)
    q = bucketed.filter(F.col(id_col).isin(QUERY_IDS)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), F.col("bucket")
    )
    c = bucketed.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), F.col("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


#: vec_ids whose embeddings serve as IVF coarse-quantizer centroids
CENTROID_IDS = [10, 11, 12, 13, 14, 15, 16, 17]
#: how many nearest cells a query probes
NPROBE = 2


def _centroid_matrix(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_ids: list[int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) of the centroid vectors, ids ascending."""
    rows = (
        corpus.filter(F.col(id_col).isin(cell_ids or CENTROID_IDS))
        .orderBy(id_col)
        .select(id_col, vec_col)
        .collect()
    )
    ids = np.array([r[0] for r in rows], dtype="int64")
    mat = np.stack([np.asarray(r[1], dtype="float64") for r in rows])
    return ids, mat


def _ranked_cells_udf(cids: np.ndarray, cents: np.ndarray):
    """Arrow-batched ranking of centroid cells per vector: centroid ids
    ordered by (cosine desc, centroid id asc).  The centroid matrix is a
    handful of rows, closed over and shipped with the UDF (the broadcast
    analog on a cluster); one numpy matmul scores a whole Arrow batch —
    the vectorized replacement for C interpreted higher-order-function
    cosines per row.  Cosines are rounded to 6 decimals BEFORE ranking so
    the order matches the oracle's ORDER BY round(...) exactly."""
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    @F.pandas_udf("array<long>")
    def ranked(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(v.to_numpy()).astype("float64")
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        cos = np.round(mat @ cn.T, 6)
        # stable argsort on -cos: ties keep ascending-centroid-id order
        order = np.argsort(-cos, axis=1, kind="stable")
        return pd.Series(list(cids[order]))

    return ranked


def pair_cos_udf():
    """Arrow-batched row-wise cosine, rounded to 6 decimals — the
    vectorized pair-scoring path shared by the ANN joins."""

    @F.pandas_udf("double")
    def pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.stack(a.to_numpy()).astype("float64")
        bv = np.stack(b.to_numpy()).astype("float64")
        num = np.einsum("ij,ij->i", av, bv)
        den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
        return pd.Series(np.round(num / den, 6))

    return pair_cos


def ivf_assign(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """IVF coarse quantization: every vector assigned to its nearest
    centroid cell (max cosine, ties → smallest centroid id).  One narrow
    Arrow-batched projection over the corpus — no shuffle."""
    cids, cents = _centroid_matrix(corpus, id_col, vec_col)
    ranked = _ranked_cells_udf(cids, cents)
    return corpus.withColumn("cell", ranked(F.col(vec_col)).getItem(0))


def ann_topk_ivf(
    corpus: DataFrame,
    k: int = TOP_K,
    nprobe: int = NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: queries probe their ``nprobe`` nearest cells and only
    vectors assigned to those cells are scored.

    The cell equi-join replaces the cross join: expected candidates per
    query ≈ nprobe·N/C.  At 100 TB the corpus would be written
    partitioned/bucketed BY cell so a probe touches only its cells'
    files — the same pruning IVF indexes do in vector stores, expressed as
    Spark partition pruning.  Cell ranking and pair scoring both run as
    Arrow-batched numpy (one matmul per batch); recall vs the exact scan
    is measured in tests (tests/test_extensions.py)."""
    from pyspark.sql import Window as W

    cids, cents = _centroid_matrix(corpus, id_col, vec_col)
    ranked = _ranked_cells_udf(cids, cents)
    # both the probe arm and the candidate arm read the assignment; persist
    # so the ranking projection runs once (the materialized analog of
    # storing the corpus partitioned BY cell, which is the layout at scale)
    assigned = tracked_persist(corpus.withColumn("cells", ranked(F.col(vec_col))))

    probes = (
        assigned.filter(F.col(id_col).isin(QUERY_IDS))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(F.slice(F.col("cells"), 1, nprobe)).alias("cell"),
        )
    )
    c = assigned.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        F.col("cells").getItem(0).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            pair_cos_udf()(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )  # each candidate lives in exactly one cell → no dedup shuffle needed
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def ivf_write_layout(corpus: DataFrame, path: str) -> None:
    """Materialize the corpus PARTITIONED BY its IVF cell — the storage
    layout that turns probing into partition pruning.  At 100 TB this is
    the ingest-side investment (one assignment pass + one partitioned
    write) that every subsequent ANN query amortizes: a probe touches
    nprobe directories, not the corpus."""
    from depositaja_spark.sources.formats import write_partitioned

    write_partitioned(ivf_assign(corpus), path, partition_by=["cell"])


def ann_topk_ivf_layout(
    spark,
    path: str,
    k: int = TOP_K,
    nprobe: int = NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k against a cell-partitioned layout
    (``ivf_write_layout``): the probed cells are resolved on the driver
    (Q·nprobe values) and applied as a static partition filter, so the
    candidate scan reads ONLY those cells' directories —
    ``PartitionFilters`` in the plan, file skipping on disk; the same
    I/O shape a vector store's IVF index gives.  Results are identical
    to ``ann_topk_ivf`` (tested)."""
    from pyspark.sql import Window as W

    corpus = spark.read.parquet(path)
    cids, cents = _centroid_matrix(corpus, id_col, vec_col)
    ranked = _ranked_cells_udf(cids, cents)
    probes = (
        corpus.filter(F.col(id_col).isin(QUERY_IDS))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.explode(F.slice(ranked(F.col(vec_col)), 1, nprobe)).alias("pcell"),
        )
    )
    # Q·nprobe cells — driver-side by design: this is what makes the
    # candidate filter STATIC and therefore prunable at plan time
    cells = sorted({r.pcell for r in probes.select("pcell").collect()})
    cand = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin([int(c) for c in cells]))
        .select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"), "cell")
    )
    scored = (
        cand.join(F.broadcast(probes), cand["cell"] == probes["pcell"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            pair_cos_udf()(F.col("qvec"), F.col("cvec")).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def quantize_embeddings(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Int8 scalar quantization: (id, scale, qvec) with
    ``q_i = floor(127·x_i/scale + 0.5)`` and ``scale = max|x_i|`` — the
    standard 4× compression of vector storage/IO at corpus scale (float32
    → int8), entirely JVM-side array expressions.

    ``floor(x + 0.5)`` instead of ``round``: one fixed rounding rule both
    engines implement identically, so the DuckDB oracle reproduces every
    quantized value bit-for-bit (the same integer-space trick as
    functions/text.py:quality_score).  Cosine is scale-invariant, so
    similarity search runs on the int8 vectors directly — no dequantize
    pass — with only the quantization-noise recall loss (tested)."""
    v = _dvec(F.col(vec_col))
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    # all-zero vectors have scale 0 — dividing by it would propagate nulls
    # through every downstream cosine, so the divisor is floored at a tiny
    # epsilon (an all-zero vector then quantizes to an all-zero qvec)
    safe = F.greatest(scale, F.lit(1e-30))
    q = F.transform(v, lambda x: F.floor(F.lit(127.0) * x / safe + F.lit(0.5)).cast("int"))
    return corpus.select(
        F.col(id_col), scale.alias("scale"), q.alias("qvec")
    )


def ann_topk_quantized(
    corpus: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k over the int8-quantized corpus: same broadcast
    cross-join + rank shape as ``cosine_topk``, but candidates and
    queries are the quantized vectors — the plan a 100 TB deployment runs
    against the compressed copy (4× less scan IO, int math in the dot
    product)."""
    qz = quantize_embeddings(corpus, id_col, vec_col)
    queries = qz.filter(F.col(id_col).isin(QUERY_IDS))
    return cosine_topk(qz, queries, k=k, id_col=id_col, vec_col="qvec")


def unit_vectors(
    corpus: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, unit) with unit = vec/‖vec‖ as array<double> — normalization
    hoisted out so pairwise scoring is a bare dot product."""
    v = _dvec(F.col(vec_col))
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    return corpus.select(
        F.col(id_col), F.transform(v, lambda x: x / n).alias("unit")
    )


def _pair_dot_udf():
    """Arrow-batched row-wise dot product.  Higher-order-function folds
    (F.aggregate over arrays) are interpreted per element inside Catalyst —
    fine for one pass over the corpus, ~40× too slow inside an all-pairs
    join.  numpy einsum over the Arrow batch is the vectorized path; the
    sum is row-local, so results don't depend on partitioning."""

    @F.pandas_udf("double")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.stack(a.to_numpy())
        bv = np.stack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", av, bv))

    return pair_dot


NEAR_DUP_BLOCK = 4096

_PAIR_SCHEMA = "a_id long, b_id long, cos double"


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = NEAR_DUP_BLOCK,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ τ, a_id < b_id) by
    block-nested-loop matrix multiply.

    Vectors are grouped into blocks of ``block_size``; the join
    materializes BLOCK PAIRS (B²/2 rows), not row pairs (N²/2), and each
    block pair is scored with one numpy matmul inside mapInPandas.  Only
    above-threshold pairs are emitted.  This is the standard distributed
    brute-force: at 100 TB the block-pair fan-out is what you shard across
    executors, and the SRP-bucket join (with_srp_buckets) prunes block
    pairs further when recall <1 is acceptable."""
    u = unit_vectors(corpus, id_col, vec_col).select(
        (F.col(id_col) / block_size).cast("long").alias("blk"),
        F.col(id_col).alias("id"),
        "unit",
    )
    mat = u.groupBy("blk").agg(
        F.collect_list(F.struct("id", "unit")).alias("rows")
    )
    x = mat.select(F.col("blk").alias("xblk"), F.col("rows").alias("xrows"))
    y = mat.select(F.col("blk").alias("yblk"), F.col("rows").alias("yrows"))
    pairs = x.join(y, F.col("xblk") <= F.col("yblk"))

    def score(batches):
        for pdf in batches:
            outs = []
            for xrows, yrows in zip(pdf["xrows"], pdf["yrows"]):
                ids_a = np.fromiter((r["id"] for r in xrows), dtype="int64")
                ids_b = np.fromiter((r["id"] for r in yrows), dtype="int64")
                A = np.stack([r["unit"] for r in xrows])
                B = np.stack([r["unit"] for r in yrows])
                C = np.round(A @ B.T, 6)
                ai, bi = np.where(C >= threshold)
                a_ids, b_ids, cs = ids_a[ai], ids_b[bi], C[ai, bi]
                keep = a_ids < b_ids
                outs.append(
                    pd.DataFrame(
                        {"a_id": a_ids[keep], "b_id": b_ids[keep], "cos": cs[keep]}
                    )
                )
            yield pd.concat(outs) if outs else pd.DataFrame(
                {"a_id": [], "b_id": [], "cos": []}
            )

    return pairs.mapInPandas(score, _PAIR_SCHEMA)


def hard_negative_pairs(
    corpus: DataFrame,
    k: int = 5,
    band_lo: float = 0.1,
    band_hi: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    block_size: int = NEAR_DUP_BLOCK,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the k
    most similar vectors with a DIFFERENT label whose (rounded) cosine
    falls in [band_lo, band_hi) — similar enough to carry training
    signal for a contrastive/embedding objective, but capped below the
    near-dup grade where a high-cosine "negative" is more likely a
    mislabeled positive than a useful one.

    THIS IS THE EXACT ALL-PAIRS RECALL BASELINE — O(N²) in the corpus
    by definition (every block pair is scored).  It exists to anchor
    the scale path (:func:`hard_negative_pairs_ivf`, per-anchor √N-cell
    IVF probing, measured ×2.85 vs ×14 at 10× in SCALING.md) and is
    guarded: inputs above ``max_rows`` (default 100k — comfortably past
    every fixture and the 10× sweep replica, far below real scale)
    raise instead of silently launching a quadratic job.  Pass
    ``max_rows=None`` only for a deliberate oversized baseline run.

    Same blocked-matmul shape as ``embedding_near_dup`` (block pairs ×
    one numpy matmul each, Arrow-batched), with the band + cross-label
    mask applied INSIDE the block kernel so only surviving cells ever
    materialize as rows; per-anchor top-k is then a keyed window over
    the (sparse) banded cells with the (cos desc, cand_id asc) total
    order.  At 100 TB the mining step composes with the ANN index
    instead: take each anchor's IVF top-m candidate list and band-filter
    it — the blocked exact scan here is the recall baseline that path is
    measured against.

    Returns (anchor_id, cand_id, cos, rank), rank 1..k per anchor.
    Labels must be non-null integers (the Arrow kernel packs them with
    ``np.fromiter(int64)``) — filter or impute unlabeled vectors
    upstream.
    """
    from pyspark.sql import Window as W

    _guard_all_pairs_baseline(corpus, max_rows, "hard_negative_pairs",
                              "hard_negative_pairs_ivf2")
    lo, hi = float(band_lo), float(band_hi)
    v = _dvec(F.col(vec_col))
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    u = corpus.select(
        (F.col(id_col) / block_size).cast("long").alias("blk"),
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lbl"),
        F.transform(v, lambda x: x / n).alias("unit"),
    )
    mat = u.groupBy("blk").agg(
        F.collect_list(F.struct("id", "lbl", "unit")).alias("rows")
    )
    x = mat.select(F.col("blk").alias("xblk"), F.col("rows").alias("xrows"))
    y = mat.select(F.col("blk").alias("yblk"), F.col("rows").alias("yrows"))
    pairs = x.join(y, F.col("xblk") <= F.col("yblk"))

    def score(batches):
        cols = {"anchor_id": [], "cand_id": [], "cos": []}

        def emit(outs, ids_a, ids_b, lbl_a, lbl_b, C, same_block):
            band = (C >= lo) & (C < hi)
            cross = lbl_a[:, None] != lbl_b[None, :]
            ai, bi = np.where(band & cross)
            if same_block:
                # C covers both orders of every same-block pair already
                keep = ids_a[ai] != ids_b[bi]
                outs.append((ids_a[ai][keep], ids_b[bi][keep], C[ai, bi][keep]))
            else:
                outs.append((ids_a[ai], ids_b[bi], C[ai, bi]))
                outs.append((ids_b[bi], ids_a[ai], C[ai, bi]))

        for pdf in batches:
            outs = []
            for xblk, yblk, xrows, yrows in zip(
                pdf["xblk"], pdf["yblk"], pdf["xrows"], pdf["yrows"]
            ):
                ids_a = np.fromiter((r["id"] for r in xrows), dtype="int64")
                ids_b = np.fromiter((r["id"] for r in yrows), dtype="int64")
                lbl_a = np.fromiter((r["lbl"] for r in xrows), dtype="int64")
                lbl_b = np.fromiter((r["lbl"] for r in yrows), dtype="int64")
                A = np.stack([r["unit"] for r in xrows])
                B = np.stack([r["unit"] for r in yrows])
                C = np.round(A @ B.T, 6)
                emit(outs, ids_a, ids_b, lbl_a, lbl_b, C, xblk == yblk)
            if outs:
                yield pd.DataFrame(
                    {
                        "anchor_id": np.concatenate([o[0] for o in outs]),
                        "cand_id": np.concatenate([o[1] for o in outs]),
                        "cos": np.concatenate([o[2] for o in outs]),
                    }
                )
            else:
                yield pd.DataFrame({k_: [] for k_ in cols})

    banded = pairs.mapInPandas(score, "anchor_id long, cand_id long, cos double")
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        banded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def hard_negative_pairs_ivf(
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = NPROBE,
    band_lo: float = 0.1,
    band_hi: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_rows: int | None = 500_000,
) -> DataFrame:
    """Single-level IVF hard-negative mining — the MID-SCALE BASELINE,
    superseded at ≥sf3 by :func:`hard_negative_pairs_ivf2` (the r11
    sf10 decade measured this variant ×52.5 under 10× data vs the
    two-level successor's ×14.1, with the successor 2.1× faster in
    absolute terms at sf10 — SCALE_SPOT_r11.jsonl; inputs past
    ``max_rows`` are refused with that pointer).  Above the exact
    blocked scan (``hard_negative_pairs``) it remains the right tool:
    every anchor probes its ``nprobe`` nearest IVF cells and only those
    cells' members are band-filtered and ranked, so per-anchor
    candidates are ≈ nprobe·N/C instead of N.  The r10 full-registry
    sweep measured the exact scan at ×14-24 under 10× data (quadratic
    by definition); this variant's cell equi-join is the join shape
    that survives mid-scale.

    The cell count SCALES with the corpus — C = ⌈√N⌉, the standard IVF
    sizing — so total candidate pairs are O(N·nprobe·√N), not O(N²):
    pinning C (the first sweep attempt used the 8 ann_topk_ivf cells)
    measured ×34 at 10× data, WORSE than the exact scan, because
    nprobe·N/C candidates per anchor still grow linearly while losing
    BLAS blocking.  Cells are the first C corpus rows at/above id 10
    (deterministic, oracle-replayable — the convention behind
    CENTROID_IDS, extended).  At deployment the corpus is written
    partitioned BY cell (``ivf_write_layout``) so the equi-join becomes
    partition pruning.  Recall tradeoff is the standard IVF one: a
    qualifying negative in an unprobed cell is missed; tests measure
    band-recall vs the exact scan on the fixture.

    Returns (anchor_id, cand_id, cos, rank), rank 1..k per anchor."""
    import math

    from pyspark.sql import Window as W

    n = corpus.count()
    _guard_mid_scale_baseline(
        n, max_rows, "hard_negative_pairs_ivf", "hard_negative_pairs_ivf2"
    )
    if n == 0:
        return corpus.select(
            F.col(id_col).alias("anchor_id"),
            F.col(id_col).alias("cand_id"),
            F.lit(0.0).alias("cos"),
            F.lit(0).cast("int").alias("rank"),
        ).limit(0)
    n_cells = max(1, math.isqrt(n - 1) + 1)  # ceil(sqrt(n))
    cell_ids = list(range(10, 10 + n_cells))
    cids, cents = _centroid_matrix(corpus, id_col, vec_col, cell_ids=cell_ids)
    ranked = _ranked_cells_udf(cids, cents)
    assigned = tracked_persist(corpus.withColumn("cells", ranked(F.col(vec_col))))
    anchors = assigned.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("avec"),
        F.col(label_col).alias("albl"),
        F.explode(F.slice(F.col("cells"), 1, nprobe)).alias("cell"),
    )
    cands = assigned.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cvec"),
        F.col(label_col).alias("blbl"),
        F.col("cells").getItem(0).alias("cell"),
    )
    cos = pair_cos_udf()(F.col("avec"), F.col("cvec"))
    scored = (
        cands.join(anchors, "cell")  # keyed shuffle: candidates co-locate by cell
        .filter(
            (F.col("cand_id") != F.col("anchor_id"))
            & (F.col("albl") != F.col("blbl"))
        )
        .select("anchor_id", "cand_id", cos.alias("cos"))
        .filter((F.col("cos") >= band_lo) & (F.col("cos") < band_hi))
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


#: anchor-row block budget shared by the two bucket dgemm kernels: each
#: dgemm materializes at most BUCKET_BLOCK_ROWS × m float64 cells, so a
#: hot bucket (a property of the DATA, not the code) bounds peak kernel
#: memory at O(BUCKET_BLOCK_ROWS · m) instead of O(|anchors| · m).
BUCKET_BLOCK_ROWS = 1024


def _row_groups(mat: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """(first_index, inverse) of the EXACT-byte-equal row groups of a
    2-D float array: ``mat[first_index]`` is one representative row per
    distinct vector and ``first_index[inverse[i]]`` is row i's
    representative.  Byte equality (a void view over each row) is the
    conservative identity — it never merges two vectors any float
    comparison could distinguish (-0.0 vs 0.0 and NaN payloads stay
    distinct), so collapsing groups can never change a cosine."""
    m = np.ascontiguousarray(mat)
    keys = m.view(f"V{m.shape[1] * m.dtype.itemsize}").ravel()
    _, first, inv = np.unique(keys, return_index=True, return_inverse=True)
    return first, inv


def _bucket_topk_kernel(
    anchors_pdf: "pd.DataFrame",
    cands_pdf: "pd.DataFrame",
    k: int,
    band_lo: float,
    band_hi: float,
    block: int = BUCKET_BLOCK_ROWS,
) -> "pd.DataFrame":
    """Score ONE (cell, sub) bucket of :func:`hard_negative_pairs_ivf2`:
    per-anchor top-``k`` cross-label candidates with rounded cosine in
    [``band_lo``, ``band_hi``), ties broken (cos desc, cand_id asc).

    Exact-duplicate collapse (r14, guide §2.5 skew): a web-scale hot
    bucket is hot precisely because it holds many EXACT-duplicate
    vectors (boilerplate embeddings), and the dgemm work was quadratic
    in the bucket size.  Both sides collapse before any O(n²) step:

    * candidates: within one (cvec-bytes, blbl) duplicate group every
      member has the SAME rounded cosine, band verdict and label
      verdict for every anchor, so a member that is not among its
      group's k+1 smallest cand_ids is preceded in every anchor's
      (cos desc, cand_id asc) ranking by k+1 group mates of which at
      most ONE can be the anchor itself — it can never enter a top-k.
      Only k+1 rows per group reach the dgemm.
    * anchors: members of one (avec-bytes, albl) duplicate group share
      their entire ranking except the self-pair exclusion, so the
      blocked dgemm + top-(k+1) selection runs ONCE per group (self
      mask deferred) and each member's top-k is derived by dropping
      its own cand_id from the group list and trimming to k — removing
      at most one element from a sorted prefix of length k+1 yields
      exactly the masked top-k.

    Work drops from O(|A|·|C|·d) to O(g_A·g_C'·d + |A|·k): linear in
    the bucket when duplicates dominate, and on an all-distinct bucket
    the groups are singletons and the dgemm is unchanged.  Anchor
    groups are blocked at ``block`` per dgemm as before (top-k is
    distributive over anchor blocks), so peak memory stays
    O(block · |C'|) regardless of skew.  The per-group selection is
    vectorized: reduced candidates are pre-sorted by cand_id, so ONE
    stable argsort on -score per block realizes the (cos desc, cand_id
    asc) tie-break for every row at once.  Module-level (not a
    closure) so the skew-adversarial tests can drive it directly with
    a small ``block`` and a tracemalloc peak-memory bound."""
    empty = pd.DataFrame(
        {"anchor_id": pd.Series([], dtype="int64"),
         "cand_id": pd.Series([], dtype="int64"),
         "cos": pd.Series([], dtype="float64")}
    )
    if len(anchors_pdf) == 0 or len(cands_pdf) == 0:
        return empty
    # ---- candidate side: keep k+1 smallest cand_ids per duplicate group
    cv_all = np.stack(cands_pdf["cvec"].to_numpy()).astype("float64")
    c_ids_all = cands_pdf["cand_id"].to_numpy().astype("int64")
    c_lbl_all = cands_pdf["blbl"].to_numpy()
    lbl_codes_all, _lbl_uniq = pd.factorize(
        np.concatenate([c_lbl_all, anchors_pdf["albl"].to_numpy()])
    )
    lbl_codes_all = lbl_codes_all + 1  # keep a null-label code (-1) positive
    c_lblc = lbl_codes_all[: len(c_lbl_all)]
    a_lblc = lbl_codes_all[len(c_lbl_all):]
    _, c_vinv = _row_groups(cv_all)
    c_ginv = c_vinv * (c_lblc.max() + 1) + c_lblc
    c_sorted = np.lexsort((c_ids_all, c_ginv))
    gs = c_ginv[c_sorted]
    seg_new = np.ones(len(gs), dtype=bool)
    seg_new[1:] = gs[1:] != gs[:-1]
    seg_start = np.maximum.accumulate(np.where(seg_new, np.arange(len(gs)), 0))
    kept = c_sorted[(np.arange(len(gs)) - seg_start) <= k]
    c_order = kept[np.argsort(c_ids_all[kept], kind="stable")]
    cv = cv_all[c_order]
    c_ids = c_ids_all[c_order]
    c_lbl = c_lblc[c_order]
    c_norm = np.linalg.norm(cv, axis=1)
    m = len(c_ids)
    # ---- anchor side: one dgemm row per (avec-bytes, albl) group
    a_ids_all = anchors_pdf["anchor_id"].to_numpy().astype("int64")
    avec_all = np.stack(anchors_pdf["avec"].to_numpy()).astype("float64")
    _, a_vinv = _row_groups(avec_all)
    a_gkey = a_vinv * (a_lblc.max() + 1 if len(a_lblc) else 1) + a_lblc
    a_guniq, a_gfirst, a_ginv = np.unique(
        a_gkey, return_index=True, return_inverse=True
    )
    g_a = len(a_guniq)
    gvec = avec_all[a_gfirst]
    glbl = a_lblc[a_gfirst]
    kk = min(k + 1, m)
    # blocked dgemm over anchor GROUPS; top-(k+1) per group, self mask
    # deferred to the expansion below
    top_g, top_c, top_s = [], [], []
    for lo in range(0, g_a, block):
        hi = min(lo + block, g_a)
        av = gvec[lo:hi]
        cosm = np.round(
            (av @ cv.T) / np.outer(np.linalg.norm(av, axis=1), c_norm), 6
        )
        ok = (
            (cosm >= band_lo)
            & (cosm < band_hi)
            & (glbl[lo:hi, None] != c_lbl[None, :])
        )
        score = np.where(ok, cosm, -np.inf)
        top = np.argsort(-score, axis=1, kind="stable")[:, :kk]
        rows = np.arange(hi - lo)[:, None]
        sel_ok = ok[rows, top]
        gi, kj = np.nonzero(sel_ok)
        if len(gi) == 0:
            continue
        sel = top[gi, kj]
        top_g.append((gi + lo).astype("int64"))
        top_c.append(c_ids[sel])
        top_s.append(cosm[gi, sel])
    if not top_g:
        return empty
    # np.nonzero is row-major and `top` columns are rank-ordered, so the
    # concatenated rows are (group asc, rank asc) — the prefix order the
    # expansion below relies on
    t_grp = np.concatenate(top_g)
    t_cid = np.concatenate(top_c)
    t_cos = np.concatenate(top_s)
    glen = np.bincount(t_grp, minlength=g_a)
    gstart = np.concatenate(([0], np.cumsum(glen)[:-1]))
    # ---- expand group lists back to the member anchors: drop the
    # member's own cand_id (at most one row), keep the first k
    L = glen[a_ginv]
    if L.sum() == 0:
        return empty
    rep_mem = np.repeat(np.arange(len(a_ids_all)), L)
    seg_starts = np.concatenate(([0], np.cumsum(L)[:-1]))
    pos = np.arange(L.sum()) - np.repeat(seg_starts, L)
    trow = gstart[a_ginv[rep_mem]] + pos
    self_ok = t_cid[trow] != a_ids_all[rep_mem]
    cs = np.cumsum(self_ok)
    base = np.concatenate(([0], cs))[seg_starts]
    kept_before = cs - self_ok - np.repeat(base, L)
    keep = self_ok & (kept_before < k)
    if not keep.any():
        return empty
    return pd.DataFrame(
        {"anchor_id": a_ids_all[rep_mem[keep]],
         "cand_id": t_cid[trow[keep]],
         "cos": t_cos[trow[keep]]}
    )


def _bucket_dropped_kernel(
    pdf: "pd.DataFrame",
    threshold: float,
    block: int = BUCKET_BLOCK_ROWS,
) -> "pd.DataFrame":
    """Apply semdedup's drop rule to ONE (cell, sub) bucket of
    :func:`semdedup_cells2`: a vector is dropped iff some LOWER-ID
    bucket member has rounded cosine ≥ ``threshold``.

    Exact-duplicate collapse (r14, guide §2.5 skew): the dgemm runs
    over the DISTINCT unit vectors only — a hot bucket full of
    boilerplate duplicates (the planted skew-spot scenario) pays
    O(g²·d + m) instead of O(m²·d).  The member verdicts replay
    exactly, because every pair's rounded cosine is a function of the
    two distinct vectors alone:

    * within a duplicate group G the pair cosine is round(u_G·u_G, 6),
      so member b is dropped by a group mate iff that self-cosine ≥ τ
      and b is not the group's minimum id;
    * across groups H ≠ G the pair cosine is round(u_H·u_G, 6), so b
      in G has a lower-id witness in H iff the groups hit and
      min_id(H) < id_b — i.e. id_b exceeds m_G = min over hitting
      H ≠ G of min_id(H).

    Distinct rows are blocked at ``block`` per dgemm (same budget as
    :func:`_bucket_topk_kernel`; min over blocks is exact), so peak
    memory stays O(block · g) on an all-distinct bucket — identical to
    the r13 bound, with g = m singleton groups.  Module-level for the
    same direct-drive skew-adversarial tests."""
    if len(pdf) < 2:
        return pd.DataFrame({"id": pd.Series([], dtype="int64")})
    ids = pdf["id"].to_numpy().astype("int64")
    um_all = np.stack(pdf["unit"].to_numpy()).astype("float64")
    first, inv = _row_groups(um_all)
    g = len(first)
    du = um_all[first]
    imax = np.iinfo(np.int64).max
    minid = np.full(g, imax, dtype="int64")
    np.minimum.at(minid, inv, ids)
    selfcos = np.round(np.einsum("ij,ij->i", du, du), 6)
    m_g = np.full(g, imax, dtype="int64")
    for lo in range(0, g, block):
        hi = min(lo + block, g)
        cos = np.round(du[lo:hi] @ du.T, 6)
        hit = cos >= threshold
        # the within-group clause is handled via selfcos below: mask the
        # H == G diagonal out of the cross-group witness minimum
        hit[np.arange(hi - lo), np.arange(lo, hi)] = False
        wit = np.where(hit, minid[lo:hi, None], imax)
        np.minimum(m_g, wit.min(axis=0), out=m_g)
    dropped = ((selfcos[inv] >= threshold) & (ids > minid[inv])) | (
        ids > m_g[inv]
    )
    out = np.sort(ids[dropped])
    return pd.DataFrame({"id": out})


def _subcent_arrays(subcent: DataFrame) -> DataFrame:
    """(cell, subs): one row per coarse cell, the cell's sub-centroids
    collected into an array of (sub, svec) structs in ascending-sub
    order.  collect_list order is nondeterministic, but array_sort on
    the struct compares ``sub`` first and sub ids are unique within a
    cell, so the array is deterministic.  C1 rows of C2 structs each —
    the same N^(2/3) values both consumers already broadcast, grouped
    so the sub-assignment and probe rankings can run as JVM folds over
    the array in the scan projection instead of a broadcast join +
    row_number window (+ Exchange + Sort) per arm (guide §2.4)."""
    return subcent.groupBy("cell").agg(
        F.array_sort(F.collect_list(F.struct("sub", "svec"))).alias("subs")
    )


def _scored_subs(vec: Column) -> Column:
    """array of (scos, sub) structs: every sub-centroid of the row's
    cell scored against ``vec`` with the SAME JVM expression the
    replaced window plans evaluated per joined row —
    ``F.round(cosine(...), 6)`` (HALF_UP) — so the values are
    bit-identical to the row_number machinery's sort keys."""
    return F.transform(
        F.col("subs"),
        lambda s: F.struct(
            F.round(cosine(vec, s["svec"]), 6).alias("scos"),
            # cast to long on BOTH ranking paths (r14, ADVICE): _best_sub's
            # accumulator is long-typed, so an int id_col would otherwise
            # widen the argmax arm's `sub` while _top_subs (no accumulator)
            # kept the source type — diverging cogroup key types.  A no-op
            # for the driver's int64 ids.
            s["sub"].cast("long").alias("sub"),
        ),
    )


def _best_sub(scored: Column) -> Column:
    """(scos, sub) of the argmax by (scos desc, sub asc) — exactly the
    ``row_number() == 1`` winner of the replaced window: the fold walks
    the array in ascending-sub order keeping a STRICTLY greater score,
    so equal-score ties keep the smaller sub, and Spark's NaN-greatest
    comparison semantics (NaN > any value, NaN > NaN false) reproduce
    descending-sort order (NaN first, ties by sub) should a NaN input
    component ever produce one (a zero-norm vector raises
    DIVIDE_BY_ZERO under ANSI mode in fold and window alike).

    NULL scores (r14, ADVICE): a null-scored element never takes the
    accumulator — the replaced desc window ordered NULLs last, and
    without the isNotNull guard a null-scored FIRST array element
    would have won the fold forever (`x.scos > NULL` is null-falsy for
    every later element).  Unreachable with non-null vectors (the
    driver's data); if EVERY element scores null the fold returns
    (null, null) where the window would pick the smallest sub — callers
    require at least one non-null-scoring sub-centroid per cell."""
    return F.aggregate(
        scored,
        F.struct(
            F.lit(None).cast("double").alias("scos"),
            F.lit(None).cast("long").alias("sub"),
        ),
        lambda acc, x: F.when(
            x["scos"].isNotNull()
            & (acc["sub"].isNull() | (x["scos"] > acc["scos"])),
            x,
        ).otherwise(acc),
    )


def _top_subs(scored: Column, n: int) -> Column:
    """First ``n`` (scos, sub) structs by (scos desc, sub asc) — the
    exact rows the replaced ``row_number() <= n`` filter kept, via one
    comparator array_sort (the order is total: subs are unique), with
    the same NaN-first property as :func:`_best_sub`."""
    ranked = F.array_sort(
        scored,
        lambda x, y: F.when(x["scos"] > y["scos"], F.lit(-1))
        .when(x["scos"] < y["scos"], F.lit(1))
        .when(x["sub"] < y["sub"], F.lit(-1))
        .when(x["sub"] > y["sub"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return F.slice(ranked, 1, n)


def hard_negative_pairs_ivf2(
    corpus: DataFrame,
    k: int = 5,
    nprobe1: int = NPROBE,
    nprobe2: int = NPROBE,
    band_lo: float = 0.1,
    band_hi: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """TWO-LEVEL IVF hard-negative mining — the O(N^(4/3)) successor the
    r11 sf10 decade demanded: the single-level √N-cell variant
    (:func:`hard_negative_pairs_ivf`) is O(N·√N) by design (assignment
    N·√N plus per-anchor √N candidates) and measured ×52 under 10× data
    at sf10 (SCALE_SPOT_r11.jsonl), so one more decade would dominate
    any pipeline.  Splitting the quantizer into C₁ = ⌈N^⅓⌉ coarse cells
    × C₂ = ⌈N^⅓⌉ sub-cells each bounds every term at O(N^(4/3)):
    coarse assignment N·C₁, sub-assignment N·C₂ (each vector scores
    only its OWN coarse cell's sub-centroids, shipped by a broadcast of
    the C₁·C₂ = N^⅔ sub-centroid frame), and per-anchor candidates
    nprobe₁·nprobe₂·N^⅓.  Expected decade ratio 10^(4/3) ≈ 21.5 vs
    the single level's 31.6 — and the constant shrinks more because
    candidate buckets are (cell, sub)-keyed, N^⅓ rows each.

    Determinism (the oracle-replayable convention): C₁ is the smallest
    integer with C₁³ ≥ N (integer-exact in BOTH engines — no float
    cube root); coarse centroids are corpus rows id 10..10+C₁-1;
    sub-centroids of cell g are g's first C₂ members by id; every
    ranking is (rounded cosine desc, id asc).  Recall tradeoff is the
    standard nested-IVF one; tests measure band-recall vs the exact
    scan and subset-consistency vs the single-level variant.

    Returns (anchor_id, cand_id, cos, rank), rank 1..k per anchor."""
    from pyspark.sql import Window as W

    n = corpus.count()
    if n == 0:
        return corpus.select(
            F.col(id_col).alias("anchor_id"),
            F.col(id_col).alias("cand_id"),
            F.lit(0.0).alias("cos"),
            F.lit(0).cast("int").alias("rank"),
        ).limit(0)
    c1 = 1
    while c1 * c1 * c1 < n:
        c1 += 1
    c2_n = c1
    cell_ids = list(range(10, 10 + c1))
    cids, cents = _centroid_matrix(corpus, id_col, vec_col, cell_ids=cell_ids)
    ranked = _ranked_cells_udf(cids, cents)
    members = tracked_persist(
        corpus.withColumn("cells", ranked(F.col(vec_col))).select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.col(label_col).alias("lbl"),
            F.col("cells").getItem(0).alias("cell"),
            F.slice(F.col("cells"), 1, nprobe1).alias("probed"),
        )
    )
    # sub-centroids: each coarse cell's first C2 members by id — a
    # C1 x C2 = N^(2/3) frame, broadcast below (at extreme corpus sizes
    # this is the term that moves to a third level).  Collected into ONE
    # array row per cell (r13): the sub-assignment and probe rankings
    # are per-row argmax / top-n over that array, so both run as JVM
    # folds inside the scan projection — the broadcast join + row_number
    # window (+ Exchange + Sort) each arm previously paid is gone, no
    # vector ever crosses an exchange before the cogroup shuffle that
    # needs it, and persisting subs_arr runs the sub-centroid window
    # once instead of once per arm.  The folds reuse the window plans'
    # exact scoring expression and realize the exact (scos desc, sub
    # asc) order (see _best_sub/_top_subs), so results are identical.
    w_first = W.partitionBy("cell").orderBy("id")
    subcent = (
        members.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") <= c2_n)
        .select("cell", F.col("id").alias("sub"), F.col("vec").alias("svec"))
    )
    subs_arr = tracked_persist(_subcent_arrays(subcent))
    assigned2 = (
        members.join(F.broadcast(subs_arr), "cell")
        .withColumn("best", _best_sub(_scored_subs(F.col("vec"))))
        .select(
            F.col("id").alias("cand_id"),
            F.col("vec").alias("cvec"),
            F.col("lbl").alias("blbl"),
            "cell",
            F.col("best.sub").alias("sub"),
        )
    )
    probes2 = (
        members.select(
            F.col("id").alias("anchor_id"),
            F.col("vec").alias("avec"),
            F.col("lbl").alias("albl"),
            F.explode("probed").alias("cell"),
        )
        .join(F.broadcast(subs_arr), "cell")
        # the grouping keys are RENAMED on this side: probes2 and
        # assigned2 share lineage (both derive from members ⋈ subs_arr),
        # and cogroup's analyzer would otherwise reject the key columns
        # as ambiguous self-join references
        .select(
            "anchor_id",
            "avec",
            "albl",
            F.col("cell").alias("pcell"),
            F.explode(_top_subs(_scored_subs(F.col("avec")), nprobe2)).alias(
                "ps"
            ),
        )
        .select(
            "anchor_id",
            "avec",
            "albl",
            "pcell",
            F.col("ps.sub").alias("psub"),
        )
    )
    # Bucket-cogrouped matmul scoring (r12, after the sf100 THIRD decade
    # measured ×32.7 vs the ×21.5 N^(4/3) theory): the old plan joined
    # probes2 ⋈ assigned2 into one ROW PER CANDIDATE PAIR carrying both
    # full vectors, so the Arrow boundary transferred N^(4/3)·d values
    # (~0.5 TB at sf100) to evaluate pair_cos_udf row-wise.  Cogrouping
    # the two sides on the SAME (cell, sub) key instead ships every
    # vector ONCE per bucket membership — O(N·d) across the boundary —
    # and scores each bucket with one dgemm (anchors × candidates,
    # ≈ nprobe²·N^⅓ × N^⅓ per bucket), applying the band + label + id
    # masks and the per-(anchor, bucket) top-k INSIDE the kernel, so
    # only ≤ nprobe₁·nprobe₂·k rows per anchor ever exist as Spark rows.
    # Arithmetic is pair_cos_udf's exactly (raw float64 dot / norm
    # product, round 6 — np.round is half-even where the JVM/DuckDB
    # round() is HALF_UP: the modes differ only when a BLAS dot lands
    # EXACTLY on a representable 5e-7 tie, and since BLAS, the JVM fold,
    # and DuckDB's list_inner_product already differ by summation-order
    # ulps, bit-parity at such a boundary is unachievable by any
    # rounding mode; the oracle differential gates the divergence);
    # top-k is distributive, so per-bucket top-k under the same
    # (cos desc, cand_id asc) tie-break followed by the global
    # per-anchor window reproduces the single-window result.
    #
    # Anchor rows are BLOCKED at 1024 per dgemm (the semdedup_cells2
    # kernel's ≈1024·m-cell budget, r12) so a hot (cell, sub) bucket —
    # a dense embedding cluster, a property of the DATA — can never
    # materialize the full |anchors|×|candidates| float64 matrix in one
    # allocation; peak kernel memory is O(1024·m) regardless of skew.
    # The kernel body lives at module level (_bucket_topk_kernel) so
    # the skew-adversarial tests can drive it directly with a small
    # block size and a tracemalloc bound.
    def bucket_topk(key, anchors_pdf, cands_pdf):
        return _bucket_topk_kernel(anchors_pdf, cands_pdf, k, band_lo, band_hi)

    pruned = (
        probes2.groupby("pcell", "psub")
        .cogroup(assigned2.groupby("cell", "sub"))
        .applyInPandas(bucket_topk, "anchor_id long, cand_id long, cos double")
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "cand_id", "cos", F.col("rank").cast("int").alias("rank"))
    )


def semdedup_sqrt_cells(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 500_000,
) -> DataFrame:
    """SemDeDup over a single-level √N-cell partition — the MID-SCALE
    BASELINE, superseded at ≥sf3 by :func:`semdedup_cells2` (the r11
    sf10 decade measured this variant ×12.1 under 10× data vs the
    two-level successor's ×7.8 — SCALE_SPOT_r11.jsonl; inputs past
    ``max_rows`` are refused with that pointer).  Above ``semdedup``
    with a pinned k-means model it remains the right tool (the r10
    sweep's worst ratio: O(N²/k) at fixed k measured ×19 under 10×
    data; with C = ⌈√N⌉ cells, expected within-cell pairs are O(N·√N)
    and the partition keeps pace with the corpus mid-scale).

    Cells are the first C corpus rows at id ≥ 10 ranked by rounded
    cosine (the deterministic, oracle-replayable convention shared with
    ``hard_negative_pairs_ivf`` / ``ann_topk_ivf`` — NOT a k-means fit,
    so no artifact to version; the tradeoff is k-means-quality cells vs
    a partition that needs zero training and scales automatically).
    The keep rule is semdedup's: a vector is dropped iff some lower-id
    vector in the same cell has cosine ≥ τ.  Returns (id, cell, keep)."""
    import math

    from depositaja_spark.functions.cache import tracked_persist as _tp

    n = corpus.count()
    _guard_mid_scale_baseline(
        n, max_rows, "semdedup_sqrt_cells", "semdedup_cells2"
    )
    if n == 0:
        return (
            corpus.select(id_col)
            .limit(0)
            .withColumn("cell", F.lit(0).cast("long"))
            .withColumn("keep", F.lit(True))
        )
    n_cells = max(1, math.isqrt(n - 1) + 1)  # ceil(sqrt(n))
    cell_ids = list(range(10, 10 + n_cells))
    cids, cents = _centroid_matrix(corpus, id_col, vec_col, cell_ids=cell_ids)
    ranked = _ranked_cells_udf(cids, cents)
    assigned = _tp(
        corpus.withColumn("cell", ranked(F.col(vec_col)).getItem(0)).select(
            id_col, "cell"
        )
    )
    u = unit_vectors(corpus, id_col, vec_col)
    cu = _tp(assigned.join(u, id_col).select("cell", F.col(id_col).alias("id"), "unit"))
    a = cu.select("cell", F.col("id").alias("a_id"), F.col("unit").alias("ua"))
    b = cu.select("cell", F.col("id").alias("b_id"), F.col("unit").alias("ub"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(dot(F.col("ua"), F.col("ub")), 6) >= threshold)
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("hit", F.lit(True)), id_col, "left_outer"
    ).select(
        id_col,
        "cell",
        F.coalesce(~F.col("hit"), F.lit(True)).alias("keep"),
    )


def semdedup_cells2(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup over a TWO-LEVEL (cell, sub-cell) partition — the
    O(N^(4/3)) successor of :func:`semdedup_sqrt_cells` (O(N·√N) by
    design, measured ×12 under 10× data at sf10), built with the same
    nested quantizer as :func:`hard_negative_pairs_ivf2`: C₁ = the
    smallest integer with C₁³ ≥ N coarse cells (corpus rows id
    10..10+C₁-1), C₁ sub-cells per coarse cell (the cell's first C₂
    members by id, rounded-cosine argmax with the smallest-sub-id
    tie-break).  Expected within-(cell, sub) pairs are O(N^(4/3)).

    The keep rule is semdedup's at the finer granularity: a vector is
    dropped iff some LOWER-ID vector in the same (cell, sub) bucket has
    cosine ≥ τ — the standard recall trade of deeper quantization
    (near-dups split across sub-cells are missed; the two partitions
    are NOT nested — C₁ coarse centroids differ from the single level's
    ⌈√N⌉ — so the drop sets are each validated against their own
    buckets by brute force, and exact clones, which always share every
    bucket, must collapse in both).  Returns (id, cell, sub, keep);
    fully oracle-replayable."""
    from depositaja_spark.functions.cache import tracked_persist as _tp
    from pyspark.sql import Window as W

    n = corpus.count()
    if n == 0:
        return (
            corpus.select(id_col)
            .limit(0)
            .withColumn("cell", F.lit(0).cast("long"))
            .withColumn("sub", F.lit(0).cast("long"))
            .withColumn("keep", F.lit(True))
        )
    c1 = 1
    while c1 * c1 * c1 < n:
        c1 += 1
    cell_ids = list(range(10, 10 + c1))
    cids, cents = _centroid_matrix(corpus, id_col, vec_col, cell_ids=cell_ids)
    ranked = _ranked_cells_udf(cids, cents)
    members = _tp(
        corpus.withColumn("cell", ranked(F.col(vec_col)).getItem(0)).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), "cell"
        )
    )
    w_first = W.partitionBy("cell").orderBy("id")
    subcent = (
        members.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") <= c1)
        .select("cell", F.col("id").alias("sub"), F.col("vec").alias("svec"))
    )
    # sub-assignment as a JVM fold over the cell's grouped sub-centroid
    # array (r13, shared with hard_negative_pairs_ivf2): same scoring
    # expression, exact (scos desc, sub asc) argmax — the broadcast join
    # + row_number window (+ Exchange + Sort) is gone
    assigned2 = _tp(
        members.join(F.broadcast(_subcent_arrays(subcent)), "cell")
        .withColumn("best", _best_sub(_scored_subs(F.col("vec"))))
        .select("id", "cell", F.col("best.sub").alias("sub"))
    )
    u = unit_vectors(corpus, id_col, vec_col)
    cu = _tp(
        assigned2.join(u, assigned2["id"] == u[id_col]).select(
            "cell", "sub", "id", "unit"
        )
    )
    # Bucket-grouped matmul drop rule (r12, same Arrow-boundary fix as
    # hard_negative_pairs_ivf2's cogrouped kernel): the a ⋈ b pair join
    # shipped BOTH unit vectors once per within-bucket PAIR — O(N^(4/3)·d)
    # across the Arrow boundary — where grouping the bucket ships each
    # vector once and one dgemm scores all pairs.  The scored value is
    # the same stored-unit dot rounded at 6.  Rounding caveat (r13):
    # np.round is HALF-EVEN where the old plan's F.round and the DuckDB
    # oracle's round() are HALF_UP — the modes diverge only when a dot
    # lands EXACTLY on a representable 5e-7 tie at τ's 6th decimal, and
    # since the JVM fold, DuckDB's list_sum, and BLAS already differ by
    # summation-order ulps, bit-parity at such a boundary is
    # unachievable by ANY rounding mode; the oracle differential gates
    # the (probabilistically tiny) divergence rather than the code
    # pretending rounding absorbs it.  The anchor-row loop is blocked
    # so a skewed bucket can never materialize an m×m matrix (budget
    # ≈ 1024·m cells per block).
    thr = float(threshold)

    dropped = cu.groupBy("cell", "sub").applyInPandas(
        lambda key, pdf: _bucket_dropped_kernel(pdf, thr), "id long"
    )
    return assigned2.join(
        dropped.withColumn("hit", F.lit(True)), "id", "left_outer"
    ).select(
        F.col("id").alias(id_col),
        "cell",
        "sub",
        F.coalesce(~F.col("hit"), F.lit(True)).alias("keep"),
    )


#: banded-SRP near-dup constants: 18 anchor hyperplanes (corpus rows, so
#: the DuckDB oracle reproduces them), split into 6 bands of 3 bits.
#: Pigeonhole: two signatures within Hamming distance ≤ bands-1 = 5 agree
#: on at least one whole band, so the band equi-join's candidate set is a
#: strict superset of every qualifying pair — no recall loss vs the
#: all-pairs evaluation of the SAME (hamming, cosine) criterion.
NEARDUP_ANCHOR_IDS = list(range(20, 38))
NEARDUP_BANDS = 6
NEARDUP_MAX_HAMMING = NEARDUP_BANDS - 1


def with_srp_signature(
    corpus: DataFrame,
    anchor_ids: list[int] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sig_col: str = "sig",
) -> DataFrame:
    """Attach an n-bit SRP signature packed into one LONG (bit i =
    [dot(vec, anchor_i) > 0], anchors ascending by id).  One corpus scan;
    the anchor dots are row-local against broadcast literal arrays."""
    ids = NEARDUP_ANCHOR_IDS if anchor_ids is None else anchor_ids
    rows = (
        corpus.filter(F.col(id_col).isin(ids))
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    sig = F.lit(0).cast("long")
    for i, r in enumerate(rows):
        a = F.array(*[F.lit(float(x)) for x in r[0]])
        sig = sig + F.when(
            F.round(dot(F.col(vec_col), a), 6) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return corpus.withColumn(sig_col, sig)


def embedding_near_dup_banded(
    corpus: DataFrame,
    threshold: float = 0.4,
    max_hamming: int = NEARDUP_MAX_HAMMING,
    bands: int = NEARDUP_BANDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Embedding near-duplicate pairs via banded SRP-LSH
    (emits (a_id, b_id, hamming, cos) for srp_hamming ≤ max_hamming AND
    cos ≥ threshold, a_id < b_id).

    Candidate generation is a keyed equi-join on (band, band-slice of the
    signature) — never an all-pairs product: per band, only same-slice
    vectors meet, and the pigeonhole bound (max_hamming ≤ bands-1)
    guarantees every qualifying pair collides in ≥1 band, so the banded
    result is PROVABLY equal to the all-pairs evaluation of the same
    criterion (asserted in tests and by the DuckDB oracle).  The exact
    verify (bit_count(xor) + true cosine on the original vectors) then
    removes false candidates.

    THE CRITERION'S DENSITY BOUNDS THE SCALE, not the plan shape (the
    r11 sf10 lesson — at 200k vectors this ran the disk out of shuffle
    spill): the Hamming ball h ≤ 5 of 18 bits covers ~4.8% of the
    signature space, so for near-uniform signatures EVERY method pays
    Ω(0.05·N²) — the OUTPUT of the loose fixture criterion (τ=0.4, the
    highest threshold with any matches in the synthetic corpus — it has
    no true high-cosine near-dups) is itself quadratic, and the 6-band
    3-bit layout caps candidate buckets at 8/band, so candidates are
    ~N²/16 regardless of banding.  A PRODUCTION near-dup criterion
    (τ ≥ 0.9 → per-bit disagreement acos(τ)/π ≤ 0.15, h concentrated
    ≤ 5) has sparse output and sparse buckets, and this same plan
    scales linearly — the knob is the threshold, not the operator.
    Inputs above ``max_rows`` (default 100k) therefore raise, naming
    the knob; pass ``max_rows=None`` for a deliberate oversized run."""
    if max_rows is not None:
        n = corpus.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_near_dup_banded at the loose fixture criterion is "
                f"output-bound quadratic (see docstring) and is capped at "
                f"{max_rows} input rows; got {n}.  At scale, tighten the "
                f"criterion to a production threshold (cos >= 0.9) where the "
                f"banded plan is sparse, or pass max_rows=None for a "
                f"deliberate oversized run."
            )
    n_anchors = len(NEARDUP_ANCHOR_IDS)
    bpb = n_anchors // bands
    assert bpb * bands == n_anchors, "bands must divide the anchor count"
    assert max_hamming <= bands - 1, "pigeonhole needs max_hamming <= bands-1"
    mask = (1 << bpb) - 1

    # filters ordered cheapest-first: the band join and the Hamming
    # filter touch ONLY (id, sig) — 16 bytes/row — so the overwhelming
    # majority of candidate pairs die before any vector is shipped or
    # any dot product runs.  Vectors join in only for Hamming survivors,
    # scored with the Arrow-batched pair-dot (HOF folds are interpreted
    # per element — fine once per corpus row, ~40× too slow per pair).
    sigs = tracked_persist(
        with_srp_signature(corpus, id_col=id_col, vec_col=vec_col).select(
            F.col(id_col).alias("id"), "sig"
        )
    )
    slices = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftright(F.col("sig"), bpb * j)
                .bitwiseAND(F.lit(mask))
                .alias("bkt"),
            )
            for j in range(bands)
        ]
    )
    keyed = sigs.select("id", "sig", F.explode(slices).alias("s")).select(
        "id", "sig", F.col("s.band").alias("band"), F.col("s.bkt").alias("bkt")
    )
    a = keyed.select(F.col("id").alias("a_id"), F.col("sig").alias("asig"), "band", "bkt")
    b = keyed.select(F.col("id").alias("b_id"), F.col("sig").alias("bsig"), "band", "bkt")
    survivors = (
        a.join(b, ["band", "bkt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("asig").bitwiseXOR(F.col("bsig"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
        .distinct()  # a pair can collide in several bands
    )
    units = unit_vectors(corpus, id_col, vec_col)
    au = units.select(F.col(id_col).alias("a_id"), F.col("unit").alias("aunit"))
    bu = units.select(F.col(id_col).alias("b_id"), F.col("unit").alias("bunit"))
    pair_dot = _pair_dot_udf()
    return (
        survivors.join(au, "a_id")
        .join(bu, "b_id")
        .withColumn("cos", F.round(pair_dot(F.col("aunit"), F.col("bunit")), 6))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", "hamming", "cos")
    )


def semantic_incremental_dedup(
    old: DataFrame,
    new: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_size: int = NEAR_DUP_BLOCK,
) -> DataFrame:
    """Incremental semantic dedup: (id, keep) for each NEW vector, where
    keep = no ACCEPTED history vector has cosine ≥ threshold.

    The embedding-space twin of functions/dedup.py:incremental_dedup's
    near tier, with the same economics: the scored pairs are
    history-block × increment-block (linear in history per batch, since
    a micro-batch contributes O(1) blocks), scored with one numpy
    matmul per block pair inside mapInPandas — never history × history.
    Same contract too: the increment is assumed internally deduped by
    the upstream intake; within-batch pairs are not checked.

    At 100 TB the history side would be the materialized unit-vector
    table (optionally SRP-bucket-pruned, trading recall for fan-in, as
    embedding_near_dup's docstring describes); deriving it per batch
    here keeps the operator self-contained for catalog-scale testing."""
    new_ids = new.select(F.col(id_col).alias("id"))
    if old.isEmpty():
        return new_ids.select(F.col("id").alias(id_col), F.lit(True).alias("keep"))
    blk = lambda df, p: (  # noqa: E731
        unit_vectors(df, id_col, vec_col)
        .select(
            (F.col(id_col) / block_size).cast("long").alias(f"{p}blk"),
            F.col(id_col).alias("id"),
            "unit",
        )
        .groupBy(f"{p}blk")
        .agg(F.collect_list(F.struct("id", "unit")).alias(f"{p}rows"))
    )
    pairs = blk(old, "x").crossJoin(F.broadcast(blk(new, "y")))

    def score(batches):
        for pdf in batches:
            hits = []
            for xrows, yrows in zip(pdf["xrows"], pdf["yrows"]):
                ids_b = np.fromiter((r["id"] for r in yrows), dtype="int64")
                A = np.stack([r["unit"] for r in xrows])
                B = np.stack([r["unit"] for r in yrows])
                C = np.round(A @ B.T, 6)
                hits.append(pd.DataFrame({"id": ids_b[np.where(C >= threshold)[1]]}))
            out = (
                pd.concat(hits).drop_duplicates()
                if hits
                else pd.DataFrame({"id": []})
            )
            yield out.astype({"id": "int64"})

    matched = pairs.mapInPandas(score, "id long").distinct()
    return new_ids.join(
        matched.withColumn("hit", F.lit(True)), "id", "left_outer"
    ).select(
        F.col("id").alias(id_col),
        F.coalesce(~F.col("hit"), F.lit(True)).alias("keep"),
    )


# --- SemDeDup: cluster-scoped semantic dedup ---------------------------------


def semdedup(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 5,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means the embeddings, then search
    for near-duplicates ONLY within each cluster → (id, cluster, keep).

    At PINNED k this is still O(N²/k) — a fixture-scale recall baseline,
    guarded like :func:`hard_negative_pairs`: inputs above ``max_rows``
    (default 100k) raise with a pointer to the √N-cell scale sibling
    (:func:`semdedup_sqrt_cells`, measured ×2.09 vs ×19 at 10× in
    SCALING.md).  Pass ``max_rows=None`` to deliberately run oversized.

    Keep rule (deterministic, order-free): a vector is dropped iff some
    LOWER-ID vector in the same cluster has cosine ≥ τ to it.  This is
    the one-shot pairwise rule (the paper's epsilon-ball sweep), not a
    transitive-closure merge — chains a~b~c with a≁c drop both b and c.

    Scale: clustering makes the pair space Σ|cluster|²/2 instead of
    N²/2 — with balanced clusters a k-fold cut, and the within-cluster
    scoring reuses the unit-vector + keyed equi-join shape (the join key
    is the cluster id, so candidate pairs co-locate on one shuffle).
    Clusters are the unit of work a 100 TB run shards across executors;
    a skewed mega-cluster is handled by raising k (or blocking inside
    the cluster exactly as embedding_near_dup blocks the full corpus).
    The centroid list is driver-side by construction (k·d doubles) —
    same bounded-summary pattern as kmeans/IVF.

    ``centroids`` optionally supplies a PINNED clustering model (k·d
    literals, e.g. functions/kmeans_artifact.py) instead of fitting —
    the deployed-model scoring mode, which is also what makes the
    registered query fully oracle-checkable (assignment argmin +
    within-cluster cosine sweep are plain SQL once the model is
    literal)."""
    from depositaja_spark.functions.kmeans import assign_clusters, kmeans_fit

    _guard_all_pairs_baseline(corpus, max_rows, "semdedup", "semdedup_cells2")
    if not corpus.head(1):  # k-means seeding cannot run on zero vectors
        return (
            corpus.select(id_col)
            .limit(0)
            .withColumn("cluster", F.lit(0))
            .withColumn("keep", F.lit(True))
        )
    cents = kmeans_fit(corpus, k, iterations, vec_col, id_col) if centroids is None else centroids
    # persisted: the (cluster, unit) frame feeds BOTH sides of the pair
    # join and the final decision join re-reads the assignment — without
    # the persist Catalyst replays the scan + Arrow assignment UDF once
    # per branch (measured 10 scans / 10 UDF evals in the final plan)
    from depositaja_spark.functions.cache import tracked_persist

    assigned = tracked_persist(
        assign_clusters(corpus, cents, vec_col).select(id_col, "cluster")
    )
    u = unit_vectors(corpus, id_col, vec_col)
    cu = tracked_persist(
        assigned.join(u, id_col).select("cluster", F.col(id_col).alias("id"), "unit")
    )
    a = cu.select("cluster", F.col("id").alias("a_id"), F.col("unit").alias("ua"))
    b = cu.select("cluster", F.col("id").alias("b_id"), F.col("unit").alias("ub"))
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(dot(F.col("ua"), F.col("ub")), 6) >= threshold)
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return assigned.join(
        dropped.withColumn("hit", F.lit(True)), id_col, "left_outer"
    ).select(
        id_col,
        "cluster",
        F.coalesce(~F.col("hit"), F.lit(True)).alias("keep"),
    )
