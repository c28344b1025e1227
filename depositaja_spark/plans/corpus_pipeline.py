"""End-to-end corpus cleaning pipeline — the canonical LLM training-data
preprocessing flow, composed from the extension operators as one
DataFrame job:

    quality gate → language gate → exact dedup → near-dup clustering
    → keeper selection

Stage economics at 100 TB (cheapest-first so every stage shrinks the
input of the next):

* the quality + language gates are ONE narrow projection + filter — no
  shuffle, evaluated inside the scan's codegen stage, so unusable
  documents never reach an exchange;
* exact dedup is one hash shuffle on the content fingerprint (window-min
  over ``md5(text)``) and typically removes the bulk of duplicate bytes;
* near-dup detection (3-gram Jaccard inverted-index join,
  functions/dedup.py:jaccard_pairs) and the connected-components closure
  (functions/graph.py:dedup_clusters) run LAST, on the smallest
  surviving set — they are the only super-linear stages.

The reference system (a wallet stream processor — see SURVEY.md) has no
corpus operators; this pipeline is the north-star extension surface
exercised end-to-end, oracle-checked as the ``clean_corpus`` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from depositaja_spark.functions import text as tx
from depositaja_spark.functions.cache import tracked_persist
from depositaja_spark.functions.dedup import jaccard_pairs
from depositaja_spark.functions.graph import duplicate_ids

#: minimum whitespace-token count for the quality gate
MIN_TOKENS = 20
#: minimum a-z character ratio for the quality gate
MIN_ALPHA = 0.8
#: 3-gram Jaccard threshold for the near-dup stage
NEAR_DUP_THRESHOLD = 0.1


def corpus_gate_scored(
    docs: DataFrame, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The gate's scoring projection WITHOUT the filter: every input
    document with (n_tokens, alpha_ratio, predicted_lang) attached —
    what ``corpus_gate`` filters, and what the drop-reason audit needs
    unfiltered (a rejected document's reason comes from these columns)."""
    toks = tx.tokens("text")
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
    alpha_ratio = F.round(n_alpha.cast("double") / F.length("text"), 6)

    scored = docs.select(
        "doc_id",
        "text",
        *extra_cols,
        n_tokens.alias("n_tokens"),
        alpha_ratio.alias("alpha_ratio"),
        *tx.lang_scores(toks),
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in tx.LANG_ORDER])
    pred = F.lit("und")
    for lang in reversed(tx.LANG_ORDER):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.withColumn("predicted_lang", pred).select(
        "doc_id",
        "text",
        *extra_cols,
        "n_tokens",
        "alpha_ratio",
        "predicted_lang",
    )


def corpus_gate(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The quality + language gates as ONE stateless projection+filter —
    (doc_id, text, predicted_lang, n_tokens) for documents passing both.
    Stateless means the SAME function gates a batch DataFrame and a
    stream (streaming/corpus.py) — one implementation, two runtimes."""
    return (
        corpus_gate_scored(docs, extra_cols)
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("alpha_ratio") >= min_alpha)
            & (F.col("predicted_lang") != "und")
        )
        .select("doc_id", "text", *extra_cols, "predicted_lang", "n_tokens")
    )


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_alpha: float = MIN_ALPHA,
    threshold: float = NEAR_DUP_THRESHOLD,
) -> DataFrame:
    """Surviving documents after the full cleaning pipeline:
    (doc_id, predicted_lang, n_tokens), one row per kept document.

    A document survives iff it (1) has ≥ ``min_tokens`` tokens and
    ≥ ``min_alpha`` alphabetic ratio, (2) gets a confident language
    prediction, (3) is the smallest doc_id of its exact-content group,
    and (4) is the smallest doc_id reachable in its near-dup cluster
    (3-gram Jaccard ≥ ``threshold``, closed transitively)."""
    base = corpus_gate(docs, min_tokens, min_alpha)

    # exact dedup: keep the min doc_id of each content-identical group —
    # one hash shuffle on md5(text)
    w = Window.partitionBy(F.md5(F.col("text")))
    # tracked: feeds pair generation, the cluster vertex set, and the
    # final join — and must be registry-tracked so the entry wrapper's
    # restricted between-queries sweep retires it (a bare .persist()
    # here was the one untracked pin the hygiene test found)
    exact = tracked_persist(
        base.withColumn("rep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("rep"))
        .drop("rep")
    )

    # near-dup removal as ONE broadcast anti-join: duplicate_ids labels
    # only the (small) dup graph and returns the ids to drop, so the
    # corpus-sized frame is never shuffled again — keeper selection costs
    # a broadcast probe per row instead of labels ∪ singles plus a
    # corpus-sized equi-join
    pairs = jaccard_pairs(exact, n=3, threshold=threshold)
    dupes = duplicate_ids(pairs)
    return (
        exact.join(F.broadcast(dupes.withColumnRenamed("id", "doc_id")), "doc_id", "left_anti")
        .select("doc_id", "predicted_lang", "n_tokens")
    )
