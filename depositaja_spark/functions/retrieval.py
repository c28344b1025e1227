"""Multi-ranker retrieval: lexical top-k + reciprocal-rank fusion.

The RAG-stack composition layer: production retrieval runs a lexical
ranker (BM25 / set overlap) AND a semantic ranker (embedding cosine)
and fuses their rankings, because each leg recalls documents the other
misses (exact keywords vs paraphrase).  Reciprocal Rank Fusion
(Cormack, Clarke, Buettcher, SIGIR 2009) is the standard score-free
fusion: rrf(d) = Σ_legs 1/(k + rank_leg(d)), summed over the legs that
ranked d at all — no score calibration between legs needed, which is
why it beats weighted score sums across heterogeneous rankers.

Scale shape: each leg is a per-query top-N frame (|queries|·N rows);
the fusion is one full-outer equi-join on (query, candidate) plus a
row-local expression and a per-query window — nothing corpus-sized
ever reaches the fusion.  The lexical leg's inverted-index join fans
out by token document frequency (a stopword touches every doc), which
is the exact-scoring baseline shape: cost is |queries| corpus scans at
worst, fine for a bounded query set, and the df-capped candidate
generation in functions/dedup.py is the drop-in if the query set ever
grows corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from depositaja_spark.functions.text import tokens

RRF_K = 60  # the SIGIR-2009 constant; dampens rank-1 dominance


def jaccard_topk(
    docs: DataFrame,
    query_ids: list[int],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-query top-``k`` documents by token-SET Jaccard — the lexical
    retrieval leg.  One distinct (doc, token) frame; the query side is
    |queries| docs' tokens, broadcast into the inverted-index equi-join;
    shared counts and set sizes are keyed aggs; ranking is a per-query
    window over the candidate frame.  Ships the RAW jaccard double
    (exact integer ratio, identical division on both engines)."""
    dt = docs.select(id_col, F.explode(tokens(text_col)).alias("tok")).distinct()
    sz = dt.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    qt = dt.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "tok"
    )
    shared = (
        dt.join(F.broadcast(qt), "tok")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("cand_id"))
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    jac = (
        shared.join(
            sz.select(F.col(id_col).alias("query_id"), F.col("n").alias("nq")),
            "query_id",
        )
        .join(
            sz.select(F.col(id_col).alias("cand_id"), F.col("n").alias("nc")),
            "cand_id",
        )
        .select(
            "query_id",
            "cand_id",
            (
                F.col("sh").cast("double")
                / (F.col("nq") + F.col("nc") - F.col("sh"))
            ).alias("jac"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jac"), F.asc("cand_id"))
    return (
        jac.withColumn("lex_rank", F.row_number().over(w))
        .filter(F.col("lex_rank") <= k)
        .select("query_id", "cand_id", "jac", F.col("lex_rank").cast("int").alias("lex_rank"))
    )


def rrf_fuse(
    sem: DataFrame,
    lex: DataFrame,
    topk: int,
    k_rrf: int = RRF_K,
) -> DataFrame:
    """Fuse a semantic leg (query_id, cand_id, rank) with a lexical leg
    (query_id, cand_id, lex_rank) by RRF and keep the per-query
    top-``topk``.  A candidate absent from one leg contributes 0 from
    it (the standard top-N-list semantics).  The two reciprocal terms
    are added in one fixed expression order — bit-stable across
    engines; ties break on cand_id."""
    s = sem.select("query_id", "cand_id", F.col("rank").alias("sem_rank"))
    l = lex.select("query_id", "cand_id", "lex_rank")
    pool = s.join(l, ["query_id", "cand_id"], "full_outer")
    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(k_rrf) + F.col("sem_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("lex_rank")), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("cand_id"))
    return (
        pool.select("query_id", "cand_id", "sem_rank", "lex_rank", rrf.alias("rrf"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
    )
