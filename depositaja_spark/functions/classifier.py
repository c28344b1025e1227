"""Distributed domain classifier: multinomial Naive-Bayes log-odds.

The standard bootstrap for pretraining-data quality filtering (fastText
quality classifiers, DSIR importance resampling, CCNet's wiki-vs-crawl
filter) is: pick a *target domain* (a trusted slice of the corpus),
train a linear text classifier of target-vs-rest, and use the per-
document score to filter or importance-reweight the remainder.  The
multinomial NB log-odds form is closed-form — no gradient loop — which
makes it the one text classifier that trains in a SINGLE distributed
aggregation pass:

    w(t) = ln( (c_target(t)+1) / (T_target+V) )
         − ln( (c_other(t) +1) / (T_other +V) )

with c_*(t) the per-class token occurrence counts, T_* the per-class
token totals, V the vocabulary size (add-1 smoothing).  A document's
score is the class prior log-odds plus the sum of its tokens' weights;
score > 0 means "more likely target-domain than not".

Scale shape (the whole point of the closed form):

* **Training is one shuffle.**  explode(tokens) → groupBy(token) with
  two conditional sums.  Map-side partial aggregation compresses each
  input partition to its local vocabulary before the exchange, so the
  shuffle volume is O(partitions × V), not O(corpus tokens).  The
  output is vocabulary-sized — millions of rows at web scale, never
  corpus-sized.
* **The normalizers are one broadcast row.**  T_target, T_other and V
  are a single ungrouped aggregate over the vocabulary frame, attached
  by a 1-row broadcast cross join (the same shape as tfidf's corpus
  count) — no driver round-trip, no collect.
* **Scoring is one token-keyed join + one doc-keyed aggregation.**
  explode(tokens) ⋈ weights on token, then groupBy(doc).  The weights
  side is vocabulary-sized; AQE broadcasts it when it fits and falls
  back to a shuffle join when a 100 TB corpus's vocabulary doesn't —
  exactly the decision that should NOT be hard-coded.  Token frequency
  skew (stopwords) is bounded per doc, and the join key distribution
  matches the corpus's natural Zipf — AQE skew-join splits the hot
  buckets.

Reference basis: the reference engine has no classifier; this family is
part of the LLM-curation surface mandated by SURVEY.md §6 (quality
scoring) and mirrors the public CCNet / DSIR recipes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions import text as tx
from depositaja_spark.functions.cache import tracked_persist

__all__ = ["token_log_odds", "score_documents"]


def token_log_odds(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Train: per-token NB log-odds of ``is_target`` vs rest.

    Returns ``(token, n_target, n_other, weight)`` — one row per
    vocabulary token.  ``is_target`` is any boolean Column over ``docs``
    (e.g. ``F.col("source").isin(...)`` for a domain classifier, or a
    heuristic quality label for a quality classifier).
    """
    a = float(smoothing)
    toks = docs.select(
        is_target.alias("_t"), F.explode(tx.tokens(text_col)).alias("token")
    )
    # one shuffle: map-side partials reduce each partition to its local
    # vocab before the exchange.  The vocab frame feeds BOTH the output
    # and the normalizer aggregate below — Catalyst does not dedupe the
    # shared subtree, so without a persist the corpus would be tokenized
    # and shuffled twice (visible as two identical partial_sum exchanges
    # in the unpersisted plan).
    cnt = tracked_persist(
        toks.groupBy("token").agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("n_target"),
            F.sum(F.when(F.col("_t"), 0).otherwise(1)).alias("n_other"),
        )
    )
    # normalizers: 1-row aggregate, broadcast cross join (bounded by
    # construction — plan-audit CARTESIAN_OK shape)
    tot = cnt.agg(
        F.sum("n_target").alias("_tp"),
        F.sum("n_other").alias("_tn"),
        F.count(F.lit(1)).alias("_v"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        "n_target",
        "n_other",
        (
            F.log((F.col("n_target") + a) / (F.col("_tp") + a * F.col("_v")))
            - F.log((F.col("n_other") + a) / (F.col("_tn") + a * F.col("_v")))
        ).alias("weight"),
    )


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame | float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score: per-document sum of token weights plus ``prior``.

    Returns ``(id_col, score, is_target_pred)`` — one row for EVERY
    input document: a document that tokenizes to zero tokens (explode
    emits no rows) is joined back in with token-sum 0, so it scores
    ``prior`` instead of silently vanishing from the output.  Tokens
    absent from ``weights`` contribute 0 (left join + coalesce) — the
    correct behavior when scoring held-out data against a trained
    vocabulary.  Duplicate tokens in a document each contribute
    (multinomial NB).

    ``prior`` is either a float or a 1-row single-column DataFrame (the
    class prior log-odds computed FROM data) attached by broadcast cross
    join — the scalar never rides through the driver.
    """
    toks = docs.select(F.col(id_col), F.explode(tx.tokens(text_col)).alias("token"))
    joined = toks.join(weights.select("token", "weight"), "token", "left_outer")
    sums = joined.groupBy(id_col).agg(
        F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_s")
    )
    base = (
        docs.select(id_col)
        .join(sums, id_col, "left_outer")
        .select(id_col, F.coalesce(F.col("_s"), F.lit(0.0)).alias("_s"))
    )
    if isinstance(prior, DataFrame):
        base = base.crossJoin(
            F.broadcast(prior.select(F.col(prior.columns[0]).alias("_p")))
        )
        total = F.col("_s") + F.col("_p")
    else:
        total = F.col("_s") + F.lit(float(prior))
    return base.select(
        id_col, total.alias("score"), (total > 0).alias("is_target_pred")
    )
