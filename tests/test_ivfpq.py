"""IVF-PQ composed index: recall against the exact scan, candidate
containment in probed cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from depositaja_spark.functions.ivfpq import ivfpq_ann_topk
from depositaja_spark.functions.similarity import (
    NPROBE,
    QUERY_IDS,
    _centroid_matrix,
    _ranked_cells_udf,
    unit_vectors,
)
from depositaja_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_ivfpq_no_loss_beyond_ivf_pruning(spark):
    """The meaningful invariant: recall is capped by IVF's probed-cell
    hit rate, and the PQ compression + exact re-rank must add NO loss on
    top of it — IVF-PQ's results match the uncompressed IVF tier's
    exactly (measured: 100% agreement; pruning bound itself is asserted
    in the ivf tier's own recall test)."""
    from depositaja_spark.functions.similarity import ann_topk_ivf

    emb = load_table(spark, SF, "embeddings")
    ivf = {(r.query_id, r.cand_id) for r in ann_topk_ivf(emb, k=5).collect()}
    ap = {(r.query_id, r.cand_id) for r in ivfpq_ann_topk(emb, k=5).collect()}
    assert ap == ivf, f"IVF-PQ diverged from IVF: {ap ^ ivf}"


def test_ivfpq_candidates_only_from_probed_cells(spark):
    """Every returned candidate must live in one of its query's probed
    cells — the pruning contract."""
    emb = load_table(spark, SF, "embeddings")
    unit = unit_vectors(emb)
    cids, cents = _centroid_matrix(unit, "vec_id", "unit")
    ranked = _ranked_cells_udf(cids, cents)
    assigned = unit.withColumn("cells", ranked(F.col("unit")))
    cell_of = {r.vec_id: r.cells[0] for r in assigned.collect()}
    probes = {
        r.vec_id: set(r.cells[:NPROBE])
        for r in assigned.filter(F.col("vec_id").isin(QUERY_IDS)).collect()
    }
    out = ivfpq_ann_topk(emb, k=5).collect()
    assert out, "no results"
    for r in out:
        assert cell_of[r.cand_id] in probes[r.query_id], (
            f"cand {r.cand_id} (cell {cell_of[r.cand_id]}) outside "
            f"probed cells {probes[r.query_id]} of query {r.query_id}"
        )


def test_incremental_verified_pairs_subset_of_full_jaccard(spark):
    """Consistency between the incremental and full dedup paths: every
    (new, old) near-dup the incremental path reports must also appear in
    the full-corpus Jaccard pair join at the same threshold (the
    incremental path can only MISS pairs — LSH candidate recall — never
    invent them)."""
    import depositaja_spark.functions.dedup as dd
    from depositaja_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    inc = dd.incremental_dedup(old, new, n=3, threshold=0.5).filter(
        F.col("near_dup_of").isNotNull()
    )
    got = {(r.doc_id, r.near_dup_of) for r in inc.collect()}
    assert got, "degenerate: no near-dups found"

    full = dd.jaccard_pairs(docs, n=3, threshold=0.5, max_df=None)
    pairs = {(r.a_id, r.b_id) for r in full.collect()}
    sym = pairs | {(b, a) for a, b in pairs}
    for new_id, old_id in got:
        assert (new_id, old_id) in sym, f"invented pair {(new_id, old_id)}"


def test_pinned_residual_codebook_artifact_provenance(spark):
    """The frozen IVF-PQ residual codebooks (functions/ivfpq_artifact.py)
    must be exactly reproducible by the repo's own pipeline (cell assign
    -> residual -> pq_train) over the recorded fit corpus."""
    from depositaja_spark.functions.ivfpq import ivfpq_residual_frame
    from depositaja_spark.functions.ivfpq_artifact import IVFPQ_BOOKS
    from depositaja_spark.functions.pq import pq_train

    fit_emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    frame, _, _ = ivfpq_residual_frame(fit_emb)
    assert pq_train(frame, vec_col="resid") == IVFPQ_BOOKS


def test_ivfpq_pinned_books_match_trained_at_fit_sf(spark):
    """At the artifact's own fit corpus (sf0.01), scoring with the pinned
    books and retraining in-process give the SAME result set — pinning
    changed the deployment mode, not the answer."""
    from depositaja_spark.functions.ivfpq_artifact import IVFPQ_BOOKS

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    pinned = {
        (r.query_id, r.cand_id, r.rank)
        for r in ivfpq_ann_topk(emb, books=IVFPQ_BOOKS).collect()
    }
    trained = {
        (r.query_id, r.cand_id, r.rank) for r in ivfpq_ann_topk(emb).collect()
    }
    assert pinned == trained
