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
    import glob as _glob
    import os as _os

    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import incremental_dedup

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        schema = "doc_id long, text string"
        if _glob.glob(_os.path.join(history_dir, "*.parquet")):
            old = spark.read.schema(schema).parquet(history_dir)
        else:
            old = spark.createDataFrame([], schema)
        new = batch.select("doc_id", F.col(text_col).alias("text"))
        res = incremental_dedup(old, new, n=n, threshold=threshold).persist()
        try:
            res.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(decisions_dir)
            # append keepers AFTER decisions are durable: on retry after a
            # crash between the writes, decisions are idempotent per
            # batch_id and keepers re-derive from them
            new.join(
                res.filter(F.col("keep")), "doc_id", "left_semi"
            ).write.mode("append").parquet(history_dir)
        finally:
            res.unpersist()
            release_caches()

    return docs_stream.writeStream.foreachBatch(_process)


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
    the increment side broadcast.  Returns a DataStreamWriter; caller
    picks trigger + checkpoint."""
    import glob as _glob
    import os as _os

    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.similarity import semantic_incremental_dedup

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        schema = f"{id_col} long, {vec_col} array<float>"
        if _glob.glob(_os.path.join(history_dir, "*.parquet")):
            old = spark.read.schema(schema).parquet(history_dir)
        else:
            old = spark.createDataFrame([], schema)
        new = batch.select(id_col, vec_col)
        res = semantic_incremental_dedup(
            old, new, threshold, id_col=id_col, vec_col=vec_col
        ).persist()
        try:
            res.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(decisions_dir)
            # keepers appended AFTER decisions are durable (crash-retry
            # idempotence per batch_id, same argument as the text tier)
            new.join(
                res.filter(F.col("keep")), id_col, "left_semi"
            ).write.mode("append").parquet(history_dir)
        finally:
            res.unpersist()
            release_caches()

    return vec_stream.writeStream.foreachBatch(_process)
