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


def mmr_rerank(
    pool: DataFrame,
    sims: DataFrame,
    k: int,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998): greedily select ``k`` of each query's candidate pool,
    each step taking argmax  λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) —
    relevance traded against redundancy with what's already picked, the
    standard diversification pass between retrieval and the context
    window.

    ``pool``: (query_id, cand_id, rel) — the per-query top-N candidates.
    ``sims``: (query_id, a, b, sim) — pairwise candidate similarities
    within each query's pool (≤ N² rows per query).

    The greedy argmax is inherently sequential PER QUERY, so it runs as
    one ``applyInPandas`` over query groups — each group is its ≤ N-row
    pool + ≤ N²-row sim table (constant-bounded), queries distribute
    freely; nothing corpus-sized reaches the driver or any single task.
    Determinism: scores are computed with literal λ and (1−λ) passed in
    as-is (callers supply e.g. 0.7/0.3 — NEVER derive 0.3 as 1−0.7,
    which is a different double), ties break on ascending cand_id, and
    both rel and sim are consumed as already-rounded values, so a
    step-generated SQL oracle replays the selection exactly.

    Returns (query_id, cand_id, mmr_rank, mmr_score)."""
    import pandas as pd

    one_minus = _exact_one_minus(lam)
    joined = pool.select("query_id", "cand_id", "rel").join(
        sims.select(
            "query_id", F.col("a").alias("cand_id"), F.col("b").alias("other"), "sim"
        ),
        ["query_id", "cand_id"],
        "left_outer",
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = {
            int(c): float(r)
            for c, r in pdf.drop_duplicates("cand_id")[["cand_id", "rel"]].itertuples(
                index=False, name=None
            )
        }
        sim = {
            (int(a), int(b)): float(s)
            for a, b, s in pdf.dropna(subset=["other"])[
                ["cand_id", "other", "sim"]
            ].itertuples(index=False, name=None)
        }
        qid = int(pdf["query_id"].iloc[0])
        selected: list[int] = []
        out = []
        remaining = set(rel)
        while remaining and len(selected) < k:
            best = None
            for c in sorted(remaining):
                red = max((sim.get((c, s), 0.0) for s in selected), default=0.0)
                score = lam * rel[c] - one_minus * red
                if best is None or score > best[1]:
                    best = (c, score)
            selected.append(best[0])
            remaining.remove(best[0])
            out.append((qid, best[0], len(selected), best[1]))
        return pd.DataFrame(
            out, columns=["query_id", "cand_id", "mmr_rank", "mmr_score"]
        )

    return joined.groupBy("query_id").applyInPandas(
        greedy, "query_id long, cand_id long, mmr_rank int, mmr_score double"
    )


def _exact_one_minus(lam: float) -> float:
    """The caller-visible complement of λ without float subtraction
    drift: 1−0.7 as doubles is 0.30000000000000004, which would diverge
    from an oracle's literal 0.3.  Round-trip through the shortest
    decimal repr instead (exact for the λ values anyone writes)."""
    return float(repr(round(1.0 - lam, 12)))


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
