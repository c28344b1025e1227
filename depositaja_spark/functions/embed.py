"""Hashed (feature-hashing / signed-random-projection) document
embeddings: a trained-model-free text embedder that lives entirely in
relational algebra.

A real pipeline embeds documents with a neural encoder (an opaque
vectorizer UDF — the multimodal module shows that plumbing).  But an
engine also needs a SELF-CONTAINED embedder for smoke-level semantic
ops: the classic feature-hashing trick (Weinberger et al. 2009) maps
each token to one of ``dim`` buckets with a pseudo-random ±1 sign and
sums, giving sparse-bag-of-words vectors whose cosine approximates
token-overlap similarity — good enough to drive the ANN / semantic-dedup
stack end-to-end from raw text, and fully oracle-checkable because both
the bucket and the sign derive from the portable 60-bit hash.

Scale: one explode + one (doc, bucket)-keyed aggregation (map-side
combined) — the same single-shuffle shape as the MinHash signature
build; normalization is row-local.  Output is ``dim`` cells per doc
(cells absent for empty buckets), or a dense array for vector
consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import tracked_persist
from depositaja_spark.functions.text import hash64, tokens

#: default embedding width; small because the vectors feed smoke-level
#: semantic ops, not a production recall target
EMBED_DIM = 16

#: which hash bit carries the ±1 sign; any bit independent of ``h % dim``
#: works for dim ≤ 2^_SIGN_BIT
_SIGN_BIT = 40


def hashed_embedding_cells(
    docs: DataFrame, dim: int = EMBED_DIM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, dim, value): L2-normalized signed-hash projection,
    exploded to cells (zero cells absent).  Normalization uses the full
    vector norm (including absent-as-zero cells — they contribute 0 to
    the norm, so no correction is needed)."""
    tok = docs.select("doc_id", F.explode(tokens(text_col)).alias("t")).select(
        "doc_id", hash64(F.col("t")).alias("h")
    )
    signed = tok.select(
        "doc_id",
        (F.col("h") % dim).alias("dim"),
        F.when(F.shiftright("h", _SIGN_BIT).bitwiseAND(F.lit(1)) == 1, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    # persisted: BOTH the norm aggregation and the normalization join
    # consume sums, and Catalyst duplicates the token-explode subtree
    # across join branches otherwise (the corpus would be scanned and
    # hashed twice — same rule as dedup.lsh_candidate_pairs)
    sums = tracked_persist(
        signed.groupBy("doc_id", "dim").agg(F.sum("s").cast("double").alias("v"))
    )
    # row-local normalization via a per-doc norm frame: one extra keyed
    # aggregation over dim-bounded rows (≤ dim per doc), not the corpus
    norms = sums.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    return (
        sums.join(norms, "doc_id")
        .filter(F.col("nrm") > 0)  # all-cancelled vectors carry no signal
        .select(
            "doc_id",
            F.col("dim").cast("int").alias("dim"),
            F.round(F.col("v") / F.col("nrm"), 6).alias("value"),
        )
    )


def hashed_embeddings(
    docs: DataFrame, dim: int = EMBED_DIM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, embedding array<double>): the dense form for vector
    consumers (cosine_topk, semdedup, PCA).  Dense assembly is
    array-side: absent cells become 0.0 via an aggregate over the
    sorted cell structs."""
    cells = hashed_embedding_cells(docs, dim, text_col)
    pairs = cells.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("dim", "value")))
        ).alias("m")
    )
    dense = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        "i -> coalesce(element_at(m, i), cast(0.0 as double)))"
    )
    return pairs.select("doc_id", dense.alias("embedding"))
