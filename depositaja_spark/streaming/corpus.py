"""Streaming corpus intake: the cleaning pipeline's front half on a
document stream.

The batch pipeline (plans/corpus_pipeline.py) orders its stages
cheapest-first; the streaming intake runs the SAME first two stages —
they are stateless, so `corpus_gate` is literally the same function —
plus exact content dedup as the only stateful operator, with
watermark-bounded fingerprints:

    document stream → quality+language gate (stateless projection)
                    → content-md5 dedup (dropDuplicatesWithinWatermark)
                    → sink (the cleaned-intake table near-dup stages
                      consume in batch)

Near-dup detection and cluster closure stay batch jobs over the intake
table: their pair joins need corpus-wide visibility that streaming state
cannot bound.  This split — stateless + keyed-dedup online, quadratic-ish
analytics offline over the materialized intake — is the standard shape of
a continuously-fed training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as _T

from depositaja_spark.plans.corpus_pipeline import MIN_ALPHA, MIN_TOKENS, corpus_gate


def streaming_corpus_intake(
    docs: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
) -> DataFrame:
    """Gated, exact-deduped document stream:
    (doc_id, text, content_md5, predicted_lang, n_tokens, ts).

    One row per distinct surviving CONTENT — a re-crawled or re-emitted
    duplicate arriving within the watermark of its first copy is dropped
    before it reaches the sink.  Which doc_id represents the content is
    arrival-order-dependent (streams have no total order); the content
    set itself is deterministic and equals the batch gate's distinct
    contents (tested)."""
    gated = corpus_gate(docs, min_tokens, min_alpha, extra_cols=(ts_col,))
    return (
        gated.withColumn("content_md5", F.md5(F.col("text")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def streaming_incremental_intake(
    docs: DataFrame,
    history: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
    text_col: str = "text",
) -> DataFrame:
    """Incremental intake: the gated, within-stream-deduped document
    stream anti-joined against the EXISTING corpus's content
    fingerprints — the streaming half of
    functions/dedup.py:incremental_dedup's exact tier.

    The history side is a **stream-static left-anti join**: Structured
    Streaming re-evaluates the static side per micro-batch, so at scale
    it should be the compact fingerprint table (16 B/doc), not the
    corpus — the same precomputed-index economics as the batch
    incremental path.  Near-dup checking against history stays batch
    (same corpus-wide-visibility argument as streaming_corpus_intake's
    docstring); this gate stops exact re-crawls from ever landing in
    the intake table."""
    intake = streaming_corpus_intake(docs, ts_col, watermark, min_tokens, min_alpha)
    hist_fp = history.select(F.md5(F.col(text_col)).alias("content_md5")).distinct()
    return intake.join(hist_fp, "content_md5", "left_anti")


def streaming_incremental_dedup(
    docs_stream: DataFrame,
    history_dir: str,
    decisions_dir: str,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
):
    """The near-dup (MinHash+LSH) tier of incremental dedup on a stream:
    a ``foreachBatch`` loop where every micro-batch of new documents is
    deduped against the history of previously ACCEPTED documents with
    the exact same batch operator (functions/dedup.py:incremental_dedup
    — exact-fingerprint tier + banded-LSH near tier + capped verify),
    then the batch's keepers are appended to the history.

    Per batch b:  decisions(b) = incremental_dedup(history, b)
                  history     += b.filter(keep)

    so a replayed stream produces bit-identical decisions to running the
    batch operator over the same splits in the same order (tested).
    Pair joins inside a batch are (history × increment) with the
    increment side broadcast — never history × history — which is what
    keeps per-batch cost linear in the history scan.  At 100 TB the
    history's fingerprints / signatures / band index would be maintained
    as materialized tables instead of derived per batch (see
    incremental_dedup's docstring); the loop structure is unchanged.

    Within-batch duplicates are NOT paired against each other (same
    contract as the batch operator: an increment is assumed internally
    deduped by the upstream intake — streaming_corpus_intake drops
    exact in-stream copies).

    Returns a DataStreamWriter; caller picks trigger + checkpoint:

        streaming_incremental_dedup(stream, hist, out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
    """
    from depositaja_spark.functions.dedup import incremental_dedup

    def _process(batch: DataFrame, batch_id: int) -> None:
        new = batch.select("doc_id", F.col(text_col).alias("text"))
        _apply_dedup_increment(
            batch.sparkSession,
            batch_id,
            new,
            lambda old, inc: incremental_dedup(old, inc, n=n, threshold=threshold),
            history_dir,
            decisions_dir,
            id_col="doc_id",
        )

    return docs_stream.writeStream.foreachBatch(_process)


def _apply_dedup_increment(
    spark,
    batch_id: int,
    new: DataFrame,
    compute,
    history_dir: str,
    decisions_dir: str,
    id_col: str,
) -> None:
    """Shared exactly-once foreachBatch body for the incremental dedup
    tiers (text MinHash and embedding-cosine).

    foreachBatch is at-least-once, so the body must be replay-safe at
    EVERY crash point:

    * decisions for batch b land atomically: staged to a temp dir, then
      renamed to ``decisions_dir/batch_id=<b>`` (Hive-style name, so a
      plain ``spark.read.parquet(decisions_dir)`` still yields the
      batch_id column via partition discovery).  A replayed batch whose
      commit dir already exists SKIPS the dedup computation entirely —
      it can never re-score the batch against its own keepers (the
      self-match-at-cosine-1.0 / own-fingerprint hole) and never appends
      contradictory decisions.
    * the history append runs AFTER the decisions commit.  On a replay
      that finds decisions committed, keepers are re-derived from the
      stored decisions and only the ids MISSING from history are
      appended — a crash between commit and append repairs exactly; a
      crash mid-append can at worst leave duplicate keeper rows from
      completed part-files, which affects later batches' scan cost but
      not their decisions (a duplicate history row matches the same
      pairs).

    The history read schema is DERIVED from the batch (id + payload
    column types), not hardcoded — a stream whose embedding column is
    array<double> round-trips with its own type instead of mis-reading
    batch 0's parquet as array<float>."""
    import os as _os

    from depositaja_spark.functions.cache import release_caches

    hist_schema = _T.StructType([new.schema[f] for f in new.columns])
    committed = _os.path.join(decisions_dir, f"batch_id={batch_id}")

    if _os.path.isdir(history_dir) and any(
        f.endswith(".parquet") for f in _os.listdir(history_dir)
    ):
        old = spark.read.schema(hist_schema).parquet(history_dir)
    else:
        old = spark.createDataFrame([], hist_schema)

    try:
        if _os.path.isdir(committed):
            # replay of an already-decided batch: repair the history
            # append if (and only to the extent) it is missing
            keep_ids = (
                spark.read.parquet(committed)
                .filter(F.col("keep"))
                .select(id_col)
            )
            missing = (
                new.join(keep_ids, id_col, "left_semi")
                .join(old.select(id_col), id_col, "left_anti")
            )
            if not missing.isEmpty():
                missing.write.mode("append").parquet(history_dir)
            return

        res = compute(old, new).persist()
        try:
            staged = _os.path.join(decisions_dir, f"_staged_{batch_id}")
            res.write.mode("overwrite").parquet(staged)
            _os.rename(staged, committed)
            new.join(
                res.filter(F.col("keep")), id_col, "left_semi"
            ).write.mode("append").parquet(history_dir)
        finally:
            res.unpersist()
    finally:
        release_caches()


def streaming_semantic_dedup(
    vec_stream: DataFrame,
    history_dir: str,
    decisions_dir: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The embedding-cosine tier of incremental dedup on a stream: the
    semantic twin of ``streaming_incremental_dedup``, same foreachBatch
    loop, same durability order:

    Per batch b:  decisions(b) = semantic_incremental_dedup(history, b)
                  history     += b.filter(keep)

    so a replayed stream produces bit-identical per-vector decisions to
    the sequential batch loop over the same splits (tested).  Per-batch
    cost is history-blocks × increment-blocks — linear in history, with
    the increment side broadcast.  Replay safety (atomic per-batch
    decision commits, skip-if-committed, history-append repair, history
    schema derived from the batch) is shared with the text tier — see
    ``_apply_dedup_increment``.  Returns a DataStreamWriter; caller
    picks trigger + checkpoint."""
    from depositaja_spark.functions.similarity import semantic_incremental_dedup

    def _process(batch: DataFrame, batch_id: int) -> None:
        new = batch.select(id_col, vec_col)
        _apply_dedup_increment(
            batch.sparkSession,
            batch_id,
            new,
            lambda old, inc: semantic_incremental_dedup(
                old, inc, threshold, id_col=id_col, vec_col=vec_col
            ),
            history_dir,
            decisions_dir,
            id_col=id_col,
        )

    return vec_stream.writeStream.foreachBatch(_process)


def streaming_bloom_dedup(
    docs_stream: DataFrame,
    fp_dir: str,
    bloom_dir: str,
    decisions_dir: str,
    m_bits: int = 1 << 20,
    text_col: str = "text",
):
    """Exact streaming dedup with the Bloom bitmap as MATERIALIZED state
    (functions/bloom.py) — the scale path streaming_incremental_dedup's
    docstring promises: the history is never rescanned per batch.

    State per accepted document: its content fingerprint (fp_dir, the
    exact-verify side) and its k bloom bits, stored as PER-BATCH DELTA
    bitmaps under ``bloom_dir/batch_id=<b>`` (≤ m/64 rows each).  Per
    micro-batch:

    1. probe = OR of all delta bitmaps (m/64-bounded rows per delta —
       KBs, not the history; compact by re-OR-ing deltas offline);
    2. ``bloom_maybe_contains`` splits the batch: definite-new documents
       skip the fingerprint table entirely, only the maybe-member
       sliver (FP-rate-bounded) exact-verifies against fp_dir;
    3. keep = fingerprint not present (Bloom has no false negatives, the
       verify join kills false positives → decisions are EXACT).

    Replay safety (same contract as _apply_dedup_increment): decisions
    commit first via staged-rename; the fp append repairs by anti-join
    on replay; the bitmap delta commits by staged-rename AND is
    OR-idempotent anyway (re-adding the same keys sets the same bits).
    Within-batch duplicates follow the intake contract (upstream drops
    exact in-stream copies).

    Returns a DataStreamWriter (caller sets checkpoint + trigger).
    """

    def _process(batch: DataFrame, batch_id: int) -> None:
        apply_bloom_dedup_batch(
            batch, batch_id, fp_dir, bloom_dir, decisions_dir, m_bits, text_col
        )

    return docs_stream.writeStream.foreachBatch(_process)


def apply_bloom_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    fp_dir: str,
    bloom_dir: str,
    decisions_dir: str,
    m_bits: int = 1 << 20,
    text_col: str = "text",
) -> None:
    """The replay-safe foreachBatch body of streaming_bloom_dedup,
    public so replays/backfills can be driven directly (and tested
    without a streaming query)."""
    import os as _os

    from depositaja_spark.functions.bloom import (
        BLOOM_K,
        bloom_build,
        bloom_maybe_contains,
    )
    from depositaja_spark.functions.cache import release_caches

    spark = batch.sparkSession
    new = batch.select("doc_id", F.md5(F.col(text_col)).alias("fp"))
    committed = _os.path.join(decisions_dir, f"batch_id={batch_id}")
    fp_schema = _T.StructType(
        [_T.StructField("doc_id", _T.LongType()), _T.StructField("fp", _T.StringType())]
    )

    def _fps():
        if _os.path.isdir(fp_dir) and any(
            f.endswith(".parquet") for f in _os.listdir(fp_dir)
        ):
            return spark.read.schema(fp_schema).parquet(fp_dir)
        return spark.createDataFrame([], fp_schema)

    def _append_missing_keepers(keep_ids):
        missing = new.join(keep_ids, "doc_id", "left_semi").join(
            _fps().select("doc_id"), "doc_id", "left_anti"
        )
        if not missing.isEmpty():
            missing.write.mode("append").parquet(fp_dir)

    def _commit_bloom_delta(keep_ids):
        delta = bloom_build(
            new.join(keep_ids, "doc_id", "left_semi"), "fp", m_bits, BLOOM_K
        )
        staged = _os.path.join(bloom_dir, f"_staged_{batch_id}")
        target = _os.path.join(bloom_dir, f"batch_id={batch_id}")
        if _os.path.isdir(target):
            return  # already committed; OR-idempotent anyway
        delta.write.mode("overwrite").parquet(staged)
        _os.rename(staged, target)

    try:
        if _os.path.isdir(committed):
            keep_ids = (
                spark.read.parquet(committed).filter(F.col("keep")).select("doc_id")
            )
            _append_missing_keepers(keep_ids)
            _commit_bloom_delta(keep_ids)
            return

        deltas = [
            _os.path.join(bloom_dir, d)
            for d in (_os.listdir(bloom_dir) if _os.path.isdir(bloom_dir) else [])
            if d.startswith("batch_id=")
        ]
        if deltas:
            bitmap = (
                spark.read.parquet(*deltas)
                .groupBy("word_idx")
                .agg(F.bit_or("word").alias("word"))
            )
            maybed = bloom_maybe_contains(
                new, bitmap, "fp", m_bits, BLOOM_K, out_col="_maybe"
            )
        else:
            maybed = new.withColumn("_maybe", F.lit(False))

        cand = maybed.filter(F.col("_maybe"))
        hit = (
            cand.join(_fps().select("fp").distinct(), "fp", "left_semi")
            .select("doc_id")
            .withColumn("_dup", F.lit(True))
        )
        decisions = (
            maybed.select("doc_id", "fp")
            .join(hit, "doc_id", "left")
            .select(
                "doc_id", F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep")
            )
            .persist()
        )
        try:
            staged = _os.path.join(decisions_dir, f"_staged_{batch_id}")
            decisions.write.mode("overwrite").parquet(staged)
            _os.rename(staged, committed)
            keep_ids = decisions.filter(F.col("keep")).select("doc_id")
            _append_missing_keepers(keep_ids)
            _commit_bloom_delta(keep_ids)
        finally:
            decisions.unpersist()
    finally:
        release_caches()
