"""Corpus-curation extension queries, batch 2: PII redaction, TF-IDF
keyword extraction, boilerplate line removal with document reassembly,
quality-ranked cluster dedup, winnowing fingerprints, mixture statistics.

Same contract as queries_ext: every query couples a Spark DataFrame plan
with a DuckDB oracle generated from the same module-level constants, and
every computed column is aliased identically on both sides.  Portable
hash and rounding conventions follow registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from depositaja_spark.functions import dedup as dd
from depositaja_spark.functions import text as tx
from depositaja_spark.queries_ext import _H64, _TOKS, _docs
from depositaja_spark.registry import query

# --- PII redaction -----------------------------------------------------------
#
# The synthetic corpus carries no PII, so the operator first *plants*
# deterministic PII derived from doc_id (same expression on both engines)
# and then redacts it — the redaction path is what's under test.  On a
# real corpus the enrichment step disappears and the redaction filters
# run as-is: row-local regexp_replace, no shuffle, pushed to the scan.
#
# Patterns are written in the common Java-regex ∩ RE2 dialect (\d, \b,
# bounded repetition — no lookaround), so Spark and DuckDB agree.

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_IPV4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PII_ACCT = "\\b\\d{13,19}\\b"

_PII_DIRTY_SQL = (
    "text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com via 10.'"
    " || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR)"
    " || '.' || CAST(doc_id % 97 AS VARCHAR) || ' acct 4'"
    " || lpad(CAST(doc_id AS VARCHAR), 15, '0')"
)


@query(
    "pii_redact",
    f"""
WITH dirty AS (SELECT doc_id, {_PII_DIRTY_SQL} AS dirty FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(dirty, '{_PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(dirty, '{_PII_IPV4}')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(
         regexp_replace(dirty, '{_PII_IPV4}', '<IP>', 'g'), '{_PII_ACCT}')) AS INT) AS n_accts,
       regexp_replace(regexp_replace(regexp_replace(dirty,
         '{_PII_EMAIL}', '<EMAIL>', 'g'),
         '{_PII_IPV4}', '<IP>', 'g'),
         '{_PII_ACCT}', '<ACCT>', 'g') AS redacted
FROM dirty
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: plant deterministic email / IPv4 / account-number
    strings per doc, then redact them with shared-dialect regexes and
    count what was removed.  Entirely row-local (scan → project), so it
    runs at corpus scan speed at any scale; account numbers are counted
    *after* IP redaction so dotted quads never double-report."""
    d = _docs(spark, sf_dir)
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 97).cast("string"),
        F.lit(" acct 4"),
        F.lpad(F.col("doc_id").cast("string"), 15, "0"),
    )
    d = d.select("doc_id", dirty.alias("dirty"))
    no_ip = F.regexp_replace("dirty", _PII_IPV4, "<IP>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("dirty", F.lit(_PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("dirty", F.lit(_PII_IPV4), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(no_ip, F.lit(_PII_ACCT), F.lit(0))).alias("n_accts"),
        F.regexp_replace(
            F.regexp_replace(no_ip, _PII_EMAIL, "<EMAIL>"), _PII_ACCT, "<ACCT>"
        ).alias("redacted"),
    )


# --- TF-IDF keyword extraction ----------------------------------------------

_TFIDF_TOPK = 3


@query(
    "tfidf_top_terms",
    f"""
WITH tf AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
),
tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tfc.doc_id, tfc.term,
         CAST(tfc.tf AS INT) AS tf, CAST(dfc.df AS INT) AS df,
         round(tfc.tf * ln(CAST(n.n AS DOUBLE) / dfc.df), 6) AS tfidf
  FROM tfc JOIN dfc USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf,
       CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored)
WHERE rank <= {_TFIDF_TOPK}
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keyword extraction (top {_TFIDF_TOPK} terms by
    ``tf · ln(N/df)``, ties broken lexicographically).

    Scale shape: two keyed aggregations (tf on (doc, term), df on term)
    plus a broadcast of the 1-row corpus count; the df side is
    vocabulary-sized, far smaller than the corpus, so the join back is
    the only real shuffle.  Score is rounded at 6 places on both engines
    before ranking so the hash — and the rank itself — can't wobble on
    float noise."""
    d = _docs(spark, sf_dir)
    tf = d.select("doc_id", F.explode(tx.tokens("text")).alias("term"))
    tfc = tf.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tfc.join(dfc, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _TFIDF_TOPK)
    )


# --- boilerplate line removal (C4-style) -------------------------------------
#
# The corpus has no newlines, so "lines" are non-overlapping 12-token
# segments (same segmentation as passage_dedup, smaller unit).  A line
# occurring in more than _LINE_DF_CAP distinct documents is boilerplate
# (nav bars, licence footers, cookie banners at web scale) and is cut
# from EVERY document; the document is then reassembled in order.

_LINE = 12
_LINE_DF_CAP = 2


@query(
    "line_dedup",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
lines AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(toks[i*{_LINE}+1 : i*{_LINE}+{_LINE}], ' ') AS line
  FROM toks CROSS JOIN (SELECT unnest(range(0, 1000)) AS i)
  WHERE i*{_LINE} < len(toks)
),
ldf AS (SELECT line, count(DISTINCT doc_id) AS line_df FROM lines GROUP BY 1),
kept AS (
  SELECT l.doc_id, l.pos, l.line, d.line_df
  FROM lines l JOIN ldf d USING (line)
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE line_df <= {_LINE_DF_CAP}) AS INT) AS n_kept,
       CAST(count(*) FILTER (WHERE line_df > {_LINE_DF_CAP}) AS INT) AS n_dropped,
       coalesce(string_agg(line, ' ' ORDER BY pos)
                  FILTER (WHERE line_df <= {_LINE_DF_CAP}), '') AS clean_text
FROM kept GROUP BY doc_id
""",
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate line removal: segment every document into
    {_LINE}-token lines, measure each line's document frequency, drop
    lines seen in more than {_LINE_DF_CAP} documents, and reassemble the
    surviving text in original order.

    Scale shape: the line-df aggregation shuffles *lines* (bounded by
    corpus size), the join back is line-keyed, and reassembly is one
    groupBy(doc_id) whose state per doc is its own lines — no global
    structure.  Order is restored from the segment index, not from
    collect order, so the rebuild is deterministic under any
    parallelism."""
    d = _docs(spark, sf_dir)
    toks = tx.tokens("text")
    n_lines = F.ceil(F.size(toks) / F.lit(_LINE)).cast("int")
    lines = d.select(
        "doc_id", toks.alias("toks"), F.explode(F.sequence(F.lit(0), n_lines - 1)).alias("pos")
    ).select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.array_join(F.slice(F.col("toks"), F.col("pos") * _LINE + 1, _LINE), " ").alias("line"),
    )
    ldf = lines.groupBy("line").agg(F.countDistinct("doc_id").alias("line_df"))
    kept = lines.join(ldf, "line")
    keep = F.col("line_df") <= _LINE_DF_CAP
    ordered = F.array_sort(F.collect_list(F.when(keep, F.struct("pos", "line"))))
    return kept.groupBy("doc_id").agg(
        F.sum(keep.cast("int")).cast("int").alias("n_kept"),
        F.sum((~keep).cast("int")).cast("int").alias("n_dropped"),
        F.array_join(F.transform(ordered, lambda s: s.line), " ").alias("clean_text"),
    )


# --- quality-ranked cluster dedup -------------------------------------------

from depositaja_spark.queries_ext import _CLUSTERS_SQL, _STOP  # noqa: E402


def _keep_best_sql() -> str:
    quality = f"""
CAST(floor(least(1000, len({_TOKS}) * 20)
           * (1000 + least(1000, floor(len(list_filter({_TOKS},
                         t -> list_contains({_STOP}, t))) * 5000 / len({_TOKS}))))
           / 2) AS DOUBLE) / 1000000.0
""".strip()
    return f"""
WITH clusters AS (
{_CLUSTERS_SQL.strip()}
),
q AS (SELECT doc_id, {quality} AS quality FROM documents)
SELECT c.doc_id, c.cluster_id, q.quality,
       row_number() OVER (PARTITION BY c.cluster_id
                          ORDER BY q.quality DESC, c.doc_id) = 1 AS keep
FROM clusters c JOIN q USING (doc_id)
"""


@query("dedup_keep_best", _keep_best_sql())
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked dedup: within each near-duplicate cluster keep the
    highest-quality document (ties → lowest doc_id) instead of the
    arbitrary min-id representative — the curation policy real pipelines
    use so boilerplate-free copies win over scraped mirrors.

    Built from parts already proven separately: connected-components
    cluster labels (keyed min-label propagation) joined with the integer
    per-mille quality score, then one row_number per cluster.  The extra
    cost over plain dedup_clusters is a single cluster-keyed window."""
    from depositaja_spark.functions.graph import dedup_clusters as _dc

    docs = _docs(spark, sf_dir)
    clusters = _dc(docs, dd.jaccard_pairs(docs, n=3, threshold=0.1)).select(
        "doc_id", "cluster_id"
    )
    quality = tx.quality_score(docs)
    w = W.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        clusters.join(quality, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "quality", "keep")
    )


# --- winnowing fingerprints (MOSS) ------------------------------------------
#
# Robust winnowing (Schleimer, Wilkerson, Aiken: "Winnowing: Local
# Algorithms for Document Fingerprinting", SIGMOD 2003): hash every
# k-gram, slide a window of w hashes, record the minimum of each window
# (rightmost occurrence on ties).  Guarantees any shared substring of
# length ≥ w+k-1 produces a shared fingerprint, with a ~2/(w+1) density.
#
# Tie-break is encoded arithmetically so a single window-min suffices:
# e = h·M − pos (pos < M), so comparing e orders first by hash, then
# prefers the LARGER position — the rightmost minimum.  Decode is exact
# integer math on both engines.

_WK = 4  # tokens per k-gram
_WW = 5  # hashes per winnow window
_WM = 100_000  # position space; docs are ≪ 1e5 tokens


@query(
    "winnow_fingerprints",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
kg AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         {_H64.format(x=f"array_to_string(toks[i:i+{_WK - 1}], ' ')")} % {tx.FP_MOD} AS h,
         len(toks) - {_WK} + 1 AS n_kg
  FROM toks CROSS JOIN (SELECT unnest(range(1, 1001)) AS i)
  WHERE i + {_WK} - 1 <= len(toks)
),
enc AS (
  SELECT doc_id, pos, n_kg, h * {_WM} - pos AS e FROM kg
),
win AS (
  SELECT doc_id, pos AS win_start, n_kg,
         min(e) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {_WW - 1} FOLLOWING) AS me
  FROM enc
)
SELECT DISTINCT doc_id,
       CAST((me + {_WM} - 1) // {_WM} AS BIGINT) AS fp_hash,
       CAST((me + {_WM} - 1) // {_WM} * {_WM} - me AS INT) AS fp_pos
FROM win
WHERE win_start <= n_kg - {_WW}
""",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (MOSS): the selected (hash, pos)
    minima of every {_WW}-hash window over {_WK}-token k-gram hashes —
    the fingerprint set that guarantees detection of any shared span of
    ≥ {_WW + _WK - 1} tokens at ~2/(w+1) storage density.

    Everything is row-local except one doc-keyed sort for the sliding
    window-min — state per document is w hashes, the selected set is a
    fraction of the token count, and no cross-document work happens at
    all (pairing fingerprints is a downstream equi-join, as in the
    near-dup tiers)."""
    d = _docs(spark, sf_dir)
    toks = tx.tokens("text")
    n_kg = (F.size(toks) - _WK + 1).alias("n_kg")
    kg = d.select(
        "doc_id",
        toks.alias("toks"),
        n_kg,
        F.explode(F.sequence(F.lit(1), F.size(toks) - _WK + 1)).alias("i"),
    ).select(
        "doc_id",
        (F.col("i") - 1).cast("int").alias("pos"),
        (tx.hash64(F.array_join(F.slice("toks", F.col("i"), _WK), " ")) % tx.FP_MOD).alias("h"),
        "n_kg",
    )
    enc = kg.select(
        "doc_id", "pos", "n_kg", (F.col("h") * _WM - F.col("pos")).alias("e")
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, _WW - 1)
    )
    win = enc.select(
        "doc_id",
        F.col("pos").alias("win_start"),
        "n_kg",
        F.min("e").over(w).alias("me"),
    ).filter(F.col("win_start") <= F.col("n_kg") - _WW)
    # integer `div`, not float floor-divide: me ~ 1e14 and the decode must
    # be exact integer math to mirror DuckDB's `//`
    fp_hash = F.expr(f"(me + {_WM - 1}) div {_WM}")
    return win.select(
        "doc_id",
        fp_hash.cast("long").alias("fp_hash"),
        (fp_hash * _WM - F.col("me")).cast("int").alias("fp_pos"),
    ).distinct()


# --- corpus mixture statistics ----------------------------------------------


@query(
    "corpus_mixture_stats",
    f"""
WITH per AS (
  SELECT lang, source,
         count(*) AS n_docs,
         sum(len({_TOKS})) AS n_tokens
  FROM documents GROUP BY 1, 2
)
SELECT lang, source,
       CAST(n_docs AS INT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6) AS token_share
FROM per
""",
)
def q_corpus_mixture_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mixture bookkeeping: per (lang, source) bucket, the
    document count, token count, and share of total corpus tokens — the
    table a mixture_sample policy is tuned against.

    One aggregation on a low-cardinality key; the global total is an
    unpartitioned window over the *aggregated* frame (|langs|·|sources|
    rows, not the corpus), which is the cheap and correct place to
    normalize."""
    d = _docs(spark, sf_dir)
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum(F.size(tx.tokens("text"))).cast("long").alias("n_tokens"),
    )
    total = W.partitionBy()
    return per.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens").cast("double") / F.sum("n_tokens").over(total), 6).alias(
            "token_share"
        ),
    )


# --- product-quantization ANN tier ------------------------------------------

from depositaja_spark.queries_ext import _emb  # noqa: E402
from depositaja_spark.registry import NO_ORACLE_OK  # noqa: E402


def _pq_sql() -> str:
    from depositaja_spark.functions.pq import PQ_RERANK
    from depositaja_spark.functions.pq_artifact import PQ_BOOKS
    from depositaja_spark.functions.similarity import QUERY_IDS, TOP_K

    dsub = len(PQ_BOOKS[0][0])
    m = len(PQ_BOOKS)
    qids = ", ".join(str(q) for q in QUERY_IDS)
    rows = ",\n       ".join(
        f"({s}, {j}, [{', '.join(repr(float(x)) for x in w)}]::DOUBLE[])"
        for s, book in enumerate(PQ_BOOKS)
        for j, w in enumerate(book)
    )
    return f"""
WITH cb(s, j, w) AS (VALUES
       {rows}),
v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
u AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS unit
      FROM v),
ss AS (SELECT unnest(range({m})) AS s),
sub AS (SELECT vec_id, s,
               list_slice(unit, s * {dsub} + 1, s * {dsub} + {dsub}) AS sv
        FROM u CROSS JOIN ss),
enc AS (SELECT vec_id, s, j AS code FROM (
          SELECT sub.vec_id, sub.s, cb.j,
                 row_number() OVER (
                   PARTITION BY sub.vec_id, sub.s
                   ORDER BY list_inner_product(cb.w, cb.w)
                            - 2 * list_inner_product(sub.sv, cb.w), cb.j) AS rn
          FROM sub JOIN cb ON cb.s = sub.s)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, unit AS qu FROM u WHERE vec_id IN ({qids})),
qsub AS (SELECT query_id, s,
                list_slice(qu, s * {dsub} + 1, s * {dsub} + {dsub}) AS qv
         FROM q CROSS JOIN ss),
lut AS (SELECT qsub.query_id, qsub.s, cb.j,
               list_inner_product(qsub.qv, cb.w) AS val
        FROM qsub JOIN cb ON cb.s = qsub.s),
adc AS (SELECT l.query_id, e.vec_id AS cand_id, round(sum(l.val), 6) AS adc
        FROM enc e JOIN lut l ON l.s = e.s AND l.j = e.code
        WHERE e.vec_id NOT IN ({qids})
        GROUP BY 1, 2),
cand AS (SELECT query_id, cand_id FROM (
           SELECT query_id, cand_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc DESC, cand_id) AS crank
           FROM adc)
         WHERE crank <= {PQ_RERANK}),
cos AS (SELECT c.query_id, c.cand_id,
               round(list_inner_product(q.qu, u.unit), 6) AS cos
        FROM cand c
        JOIN q ON q.query_id = c.query_id
        JOIN u ON u.vec_id = c.cand_id)
SELECT query_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM cos QUALIFY rank <= {TOP_K}
"""


@query("ann_topk_pq", _pq_sql())
def q_ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ+ADC approximate cosine top-k (functions/pq.py): codebook-
    compressed vectors (m subspace codes per vector) scored by per-query
    lookup tables inlined as literals, top-R pool exactly re-ranked.
    Scores against the PINNED codebooks (functions/pq_artifact.py —
    trained once at sf0.01 with the repo's own sampler + k-means, frozen
    as literals): a deployed PQ index ships its codebooks as a versioned
    artifact, and pinning makes encode → LUT → ADC → re-rank plain
    relational algebra, so the query carries a full DuckDB value oracle
    (rows-only through round 7, when it re-trained per run).  Training
    keeps its gates: recall bounds + provenance re-fit in
    tests/test_pq.py."""
    from depositaja_spark.functions.pq import pq_ann_topk
    from depositaja_spark.functions.pq_artifact import PQ_BOOKS

    return pq_ann_topk(_emb(spark, sf_dir), books=PQ_BOOKS)


# --- distributed BPE tokenizer training --------------------------------------


def _bpe_train_sql() -> str:
    from depositaja_spark.functions.bpe import bpe_train_oracle_sql

    return bpe_train_oracle_sql(8)


@query("bpe_merges", _bpe_train_sql())
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 8 learned BPE merges over the corpus (functions/bpe.py):
    one corpus pass builds the word-count vocab, then each round is a
    vocab-sized pair aggregation + k=1 collect (driver-coordinated like
    k-means), with the merge applied as a codegen'd array fold.

    Rows-only through round 10; now ORACLE-backed — the per-merge
    driver round is sequential, but each round is still deterministic
    relational algebra over the vocab, so the whole training loop
    unrolls into chained CTEs: pair-frequency argmax with the trainer's
    exact tie-break, then the merge applied with the single-replace
    equivalence of bpe_segment_oracle_sql, the pattern built from the
    round's own argmax row (functions/bpe.py:bpe_train_oracle_sql).
    Golden-merge parity against an independent in-memory BPE stays in
    tests/test_bpe.py."""
    from depositaja_spark.functions.bpe import bpe_train

    merges = bpe_train(_docs(spark, sf_dir), num_merges=8)
    return spark.createDataFrame(
        [(i, l, r, f) for i, (l, r, f) in enumerate(merges)],
        "step int, left string, right string, freq long",
    )


def _bpe_apply_trained_sql() -> str:
    from depositaja_spark.functions.bpe import bpe_apply_trained_oracle_sql

    return bpe_apply_trained_oracle_sql(8)


@query("bpe_subword_counts", _bpe_apply_trained_sql())
def q_bpe_subword_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document subword counts under the learned BPE merges — the
    token-budget accounting a training pipeline runs after fitting its
    tokenizer.  Rows-only through round 10; now ORACLE-backed end to
    end: the oracle re-derives every merge with the trainer chain
    (bpe_train_oracle_sql) and applies each round's argmax to a
    parallel per-document chain (bpe_apply_trained_oracle_sql) — the
    full train-then-segment pipeline value-checked in one SQL
    statement.  Monotonicity and zero-merge identity remain
    pytest-verified; the pinned-merge twin ``bpe_segment_replay``
    below covers the deployed-artifact path."""
    from depositaja_spark.functions.bpe import bpe_apply, bpe_train

    docs = _docs(spark, sf_dir)
    return bpe_apply(docs, bpe_train(docs, num_merges=8))


def _bpe_seg_sql() -> str:
    from depositaja_spark.functions.bpe import bpe_segment_oracle_sql
    from depositaja_spark.functions.bpe_artifact import BPE_MERGES

    return bpe_segment_oracle_sql(BPE_MERGES)


@query("bpe_segment_replay", _bpe_seg_sql())
def q_bpe_segment_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/subword counts under the PINNED 12-merge BPE
    table (functions/bpe_artifact.py — trained once at sf0.01 with the
    repo's own trainer and frozen, the PQ_BOOKS artifact discipline).
    Segmentation given a pinned merge list is a deterministic state
    machine, so unlike the training-bound bpe_subword_counts this
    carries a full DuckDB value oracle: the oracle replays every merge
    as one left-to-right non-overlapping substring replace over a
    boundary-encoded symbol string (the r10 replay-the-state-machine
    technique, here needing no recursion at all — see
    functions/bpe.py:bpe_segment_oracle_sql for the equivalence proof).
    The Spark side is the production path: the same codegen'd array
    fold per merge, no Python anywhere."""
    from depositaja_spark.functions.bpe import bpe_apply
    from depositaja_spark.functions.bpe_artifact import BPE_MERGES

    return bpe_apply(_docs(spark, sf_dir), BPE_MERGES)


# --- deterministic fixed-k per-stratum sampling ------------------------------

_FIXK = 20
_FIXK_SALT = "fixk-v1:"


@query(
    "stratified_fixed_k",
    f"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('{_FIXK_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {_FIXK}
""",
)
def q_stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-{_FIXK}-per-language sample, chosen by salted-hash order —
    the deterministic replacement for reservoir sampling: membership
    depends only on (salt, doc_id, lang), so re-runs and backfills pick
    the same rows (unlike ``sample``/reservoirs, which depend on
    partitioning).  One lang-keyed window; Spark plans the rank-filter
    as a running top-k (WindowGroupLimit pushes the limit into the
    sort), so per-stratum state is k rows, not the stratum."""
    d = _docs(spark, sf_dir)
    w = W.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit(_FIXK_SALT), F.col("doc_id").cast("string"))), F.asc("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _FIXK)
        .select("doc_id", "lang")
    )


# --- shuffle-key skew diagnostics --------------------------------------------

from depositaja_spark.sources import load_table  # noqa: E402


@query(
    "skew_report_events",
    """
WITH sizes AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(count(*) AS BIGINT) AS distinct_keys,
       round(avg(n), 4) AS mean_rows_per_key,
       CAST(max(n) AS BIGINT) AS max_rows_per_key,
       max_by(CAST(user_id AS VARCHAR),
              lpad(CAST(n AS VARCHAR), 19, '0') || '|' || CAST(user_id AS VARCHAR)) AS hot_key,
       round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS hot_key_share,
       round(CAST(max(n) AS DOUBLE) / avg(n), 4) AS skew_factor
FROM sizes
""",
)
def q_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key health report for events.user_id (functions/skew.py:
    skew_report): the pre-flight measurement that decides whether a
    keyed aggregation needs salting or AQE skew splitting.  Ties on the
    hot key break by the key string (max_by on a (count, key) struct),
    identical on both engines."""
    from depositaja_spark.functions.skew import skew_report

    return skew_report(load_table(spark, sf_dir, "events"), "user_id")


def _ivfpq_sql() -> str:
    from depositaja_spark.functions.ivfpq_artifact import IVFPQ_BOOKS
    from depositaja_spark.functions.pq import PQ_RERANK
    from depositaja_spark.functions.similarity import (
        CENTROID_IDS,
        NPROBE,
        QUERY_IDS,
        TOP_K,
    )

    dsub = len(IVFPQ_BOOKS[0][0])
    m = len(IVFPQ_BOOKS)
    dim = m * dsub
    qids = ", ".join(str(q) for q in QUERY_IDS)
    cids = ", ".join(str(c) for c in CENTROID_IDS)
    rows = ",\n       ".join(
        f"({s}, {j}, [{', '.join(repr(float(x)) for x in w)}]::DOUBLE[])"
        for s, book in enumerate(IVFPQ_BOOKS)
        for j, w in enumerate(book)
    )
    return f"""
WITH cb(s, j, w) AS (VALUES
       {rows}),
v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
u AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS unit
      FROM v),
-- coarse centroids are corpus rows; the engine re-normalizes the
-- collected unit rows once more, mirrored here (cu2)
cent AS (SELECT vec_id AS cid,
                list_transform(unit, x -> x / sqrt(list_inner_product(unit, unit))) AS cu2
         FROM u WHERE vec_id IN ({cids})),
cell_scores AS (SELECT u.vec_id, c.cid, c.cu2,
                       round(list_inner_product(u.unit, c.cu2), 6) AS ccos
                FROM u CROSS JOIN cent c),
assigned AS (SELECT vec_id, cid AS cell FROM cell_scores
             QUALIFY row_number() OVER (PARTITION BY vec_id
                                        ORDER BY ccos DESC, cid) = 1),
-- residual = unit − unit centroid of the assigned cell
r AS (SELECT u.vec_id, a.cell,
             list_transform(range(1, {dim + 1}),
                            i -> u.unit[i] - c.cu2[i]) AS resid
      FROM u JOIN assigned a ON a.vec_id = u.vec_id
      JOIN cent c ON c.cid = a.cell),
ss AS (SELECT unnest(range({m})) AS s),
sub AS (SELECT vec_id, cell, s,
               list_slice(resid, s * {dsub} + 1, s * {dsub} + {dsub}) AS sv
        FROM r CROSS JOIN ss),
enc AS (SELECT vec_id, cell, s, j AS code FROM (
          SELECT sub.vec_id, sub.cell, sub.s, cb.j,
                 row_number() OVER (
                   PARTITION BY sub.vec_id, sub.s
                   ORDER BY list_inner_product(cb.w, cb.w)
                            - 2 * list_inner_product(sub.sv, cb.w), cb.j) AS rn
          FROM sub JOIN cb ON cb.s = sub.s)
        WHERE rn = 1),
q AS (SELECT vec_id AS query_id, unit AS qu FROM u WHERE vec_id IN ({qids})),
-- nprobe nearest cells per query; bias = q · unit centroid (full
-- precision, like the engine's driver-side probe table)
probes AS (SELECT cs.vec_id AS query_id, cs.cid AS cell,
                  list_inner_product(q.qu, cs.cu2) AS bias
           FROM cell_scores cs JOIN q ON q.query_id = cs.vec_id
           QUALIFY row_number() OVER (PARTITION BY cs.vec_id
                                      ORDER BY cs.ccos DESC, cs.cid) <= {NPROBE}),
qsub AS (SELECT query_id, s,
                list_slice(qu, s * {dsub} + 1, s * {dsub} + {dsub}) AS qv
         FROM q CROSS JOIN ss),
lut AS (SELECT qsub.query_id, qsub.s, cb.j,
               list_inner_product(qsub.qv, cb.w) AS val
        FROM qsub JOIN cb ON cb.s = qsub.s),
adc AS (SELECT p.query_id, e.vec_id AS cand_id,
               round(any_value(p.bias) + sum(l.val), 6) AS adc
        FROM enc e
        JOIN probes p ON p.cell = e.cell AND e.vec_id != p.query_id
        JOIN lut l ON l.query_id = p.query_id AND l.s = e.s AND l.j = e.code
        GROUP BY 1, 2),
cand AS (SELECT query_id, cand_id FROM (
           SELECT query_id, cand_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY adc DESC, cand_id) AS crank
           FROM adc)
         WHERE crank <= {PQ_RERANK}),
cos AS (SELECT c.query_id, c.cand_id,
               round(list_inner_product(q.qu, u.unit), 6) AS cos
        FROM cand c
        JOIN q ON q.query_id = c.query_id
        JOIN u ON u.vec_id = c.cand_id)
SELECT query_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM cos QUALIFY rank <= {TOP_K}
"""


@query("ann_topk_ivfpq", _ivfpq_sql())
def q_ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (functions/ivfpq.py): coarse cells prune the
    scan to nprobe probes, product-quantized residuals shrink the
    scanned bytes to m codes/vector, per-query literal LUTs score
    bias + ADC JVM-side (totals rounded to 6 before the candidate cut
    so the pool is order-independent), and the top-R pool is exactly
    re-ranked.  Scores against the PINNED residual codebooks
    (functions/ivfpq_artifact.py — trained once at sf0.01 with the
    repo's own sampler + k-means, frozen as literals); the coarse
    quantizer needs no pinning because its centroids ARE corpus rows
    (similarity.py:CENTROID_IDS), so the full pipeline is relational
    algebra and the query carries a DuckDB value oracle (rows-only
    through round 7, when it re-trained per run).  Training keeps its
    gates: recall + cell-pruning + provenance re-fit in
    tests/test_ivfpq.py."""
    from depositaja_spark.functions.ivfpq import ivfpq_ann_topk
    from depositaja_spark.functions.ivfpq_artifact import IVFPQ_BOOKS

    return ivfpq_ann_topk(_emb(spark, sf_dir), books=IVFPQ_BOOKS)


# --- incremental dedup (daily-ingest shape) ----------------------------------

_INC_MOD = 10  # doc_id % 10 == 0 → the "new increment"; rest = history


def _inc_dedup_sql() -> str:
    mins = ",\n         ".join(
        f"min(({a} * h + {b}) % {dd.MINHASH_P}) AS mh_{i}"
        for i, (a, b) in enumerate(dd.MINHASH_COEFFS)
    )
    band_selects = []
    for b in range(dd.LSH_BANDS):
        cols = [f"mh_{b * dd.LSH_ROWS + r}" for r in range(dd.LSH_ROWS)]
        key = "md5(concat_ws(':', " + ", ".join(f"CAST({c} AS VARCHAR)" for c in cols) + "))"
        band_selects.append(f"SELECT doc_id, {b} AS band, {key} AS band_key FROM sigs")
    bands = "\nUNION ALL\n".join(band_selects)
    from depositaja_spark.queries_ext import _SHINGLES_SQL

    return f"""
WITH {_SHINGLES_SQL},
h AS (SELECT doc_id, {_H64.format(x='shingle')} % {dd.MINHASH_P} AS h FROM shingles),
sigs AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
  FROM bands n JOIN bands o ON n.band = o.band AND n.band_key = o.band_key
  WHERE n.doc_id % {_INC_MOD} = 0 AND o.doc_id % {_INC_MOD} <> 0
),
sz AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.new_id, c.old_id, count(*) AS inter
  FROM cand c
  JOIN shingles a ON a.doc_id = c.new_id
  JOIN shingles b ON b.doc_id = c.old_id AND b.shingle = a.shingle
  GROUP BY 1, 2
),
ver AS (
  SELECT i.new_id, i.old_id
  FROM inter i
  JOIN sz sn ON sn.doc_id = i.new_id
  JOIN sz so ON so.doc_id = i.old_id
  WHERE round(CAST(i.inter AS DOUBLE) / (sn.sz + so.sz - i.inter), 6) >= 0.5
),
near AS (SELECT new_id, min(old_id) AS near_dup_of FROM ver GROUP BY 1),
ex AS (
  SELECT DISTINCT n.doc_id FROM documents n JOIN documents o
    ON md5(n.text) = md5(o.text)
   AND n.doc_id % {_INC_MOD} = 0 AND o.doc_id % {_INC_MOD} <> 0
)
SELECT d.doc_id,
       d.doc_id IN (SELECT doc_id FROM ex) AS dup_exact,
       near.near_dup_of,
       (d.doc_id NOT IN (SELECT doc_id FROM ex) AND near.near_dup_of IS NULL) AS keep
FROM documents d LEFT JOIN near ON near.new_id = d.doc_id
WHERE d.doc_id % {_INC_MOD} = 0
"""


@query("incremental_dedup", _inc_dedup_sql())
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a 10% increment against the other 90% as the
    existing corpus (functions/dedup.py:incremental_dedup): exact
    fingerprint semi-join + cross-frame banded LSH with candidate-only
    Jaccard verify (τ=0.5).  The history is never self-joined and every
    increment-keyed frame is broadcast — the daily-ingest shape at
    100 TB."""
    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % _INC_MOD != 0)
    new = docs.filter(F.col("doc_id") % _INC_MOD == 0)
    return dd.incremental_dedup(old, new, n=3, threshold=0.5)


# --- time-series resampling ---------------------------------------------------


@query(
    "resample_ffill_hourly",
    """
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
obs AS (
  SELECT user_id, bucket, value AS obs_value
  FROM (
    SELECT user_id, date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT g.user_id,
       epoch_ms(g.bucket) AS bucket_ms,
       last_value(o.obs_value IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
""",
)
def q_resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resampling of each user's event series
    (functions/temporal.py:resample_ffill): fixed grid from first to
    last bucket, forward-filled with the bucket's LAST observation
    (deterministic (ts, event_id) tie-break).  All stages key-local."""
    from depositaja_spark.functions.temporal import resample_ffill

    return resample_ffill(load_table(spark, sf_dir, "events"))


@query(
    "resample_interp_hourly",
    """
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
obs AS (
  SELECT user_id, bucket, value AS obs_value
  FROM (
    SELECT user_id, date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
anchored AS (
  SELECT g.user_id, epoch_ms(g.bucket) AS bucket_ms, o.obs_value,
         last_value(o.obs_value IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN o.obs_value IS NOT NULL THEN epoch_ms(g.bucket) END
                    IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
         first_value(o.obs_value IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN o.obs_value IS NOT NULL THEN epoch_ms(g.bucket) END
                     IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
)
SELECT user_id, bucket_ms,
       CASE WHEN obs_value IS NOT NULL THEN obs_value
            ELSE pv + (nv - pv) * (CAST(bucket_ms - pb AS DOUBLE)
                                   / CAST(nb - pb AS DOUBLE)) END AS value_interp,
       obs_value IS NULL AS interpolated
FROM anchored
""",
)
def q_resample_interp_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resampling with LINEAR interpolation
    (functions/temporal.py:resample_interp): empty buckets take the
    straight line between the surrounding observed anchors instead of
    the flat carry-forward — the unbiased resampling mode for numeric
    telemetry.  Same scale shape as resample_ffill_hourly: per-key
    bounded grid, two key-ordered anchor windows, one row-local
    interpolation expression on epoch-ms integers; edges never
    extrapolate because the grid spans exactly [first, last] per key."""
    from depositaja_spark.functions.temporal import resample_interp

    return resample_interp(load_table(spark, sf_dir, "events"))


# --- rolling anomaly detection on the resampled grid -------------------------

_ANOM_WIN = 24  # trailing buckets in the rolling baseline
_ANOM_Z = 2.0


@query(
    "resample_anomalies",
    f"""
WITH bounds AS (
  SELECT user_id, date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
  FROM bounds
),
obs AS (
  SELECT user_id, bucket, value AS obs_value
  FROM (
    SELECT user_id, date_trunc('hour', ts) AS bucket, value,
           row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
filled AS (
  SELECT g.user_id, g.bucket,
         last_value(o.obs_value IGNORE NULLS)
           OVER (PARTITION BY g.user_id ORDER BY g.bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
),
scored AS (
  SELECT user_id, bucket, v,
         avg(v)    OVER w AS mu,
         stddev(v) OVER w AS sd,
         count(*)  OVER w AS n
  FROM filled
  WINDOW w AS (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN {_ANOM_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT user_id, epoch_ms(bucket) AS bucket_ms, round(v, 4) AS value,
       round((v - mu) / sd, 4) AS zscore
FROM scored
WHERE n >= {_ANOM_WIN} AND sd >= 1e-9 AND abs(round((v - mu) / sd, 4)) >= {_ANOM_Z}
""",
)
def q_resample_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the gap-filled hourly
    series: each bucket scored against the trailing {_ANOM_WIN}-bucket
    baseline (strictly BEFORE the current bucket, so an anomaly never
    contaminates its own baseline); flagged at |z| ≥ {_ANOM_Z} once the
    baseline is full.

    Composes resample_ffill with two key-ordered window aggregates —
    per-key state is the {_ANOM_WIN}-row frame, nothing global."""
    from depositaja_spark.functions.temporal import resample_ffill

    filled = resample_ffill(load_table(spark, sf_dir, "events"))
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket_ms")
        .rowsBetween(-_ANOM_WIN, -1)
    )
    mu = F.avg("value_ffill").over(w)
    sd = F.stddev("value_ffill").over(w)
    # frame row count = min(rows before current, window) — exact integer
    # arithmetic from the running row_number instead of a third sliding
    # frame aggregate (measured -43% on the window stage at sf0.1; the
    # oracle keeps count(*) OVER w, which is the same number)
    n = F.least(
        F.row_number().over(W.partitionBy("user_id").orderBy("bucket_ms")) - 1,
        F.lit(_ANOM_WIN),
    )
    z = (F.col("value_ffill") - mu) / sd
    return (
        filled.select(
            "user_id",
            "bucket_ms",
            F.round(F.col("value_ffill"), 4).alias("value"),
            F.round(z, 4).alias("zscore"),
            n.alias("_n"),
            sd.alias("_sd"),
        )
        # sd floor at 1e-9, not 0: a flat (forward-filled) baseline has
        # true stddev 0, but single-pass variance can return ~1e-15 noise
        # that would amplify into phantom z-scores; both engines share the
        # floor, and the threshold compares the ROUNDED z for hash parity
        .filter(
            (F.col("_n") >= _ANOM_WIN) & (F.col("_sd") >= 1e-9) & (F.abs("zscore") >= _ANOM_Z)
        )
        .drop("_n", "_sd")
    )


# --- weighted fixed-k sampling (exponential race) ----------------------------

_WFIXK = 20
_WFIXK_SALT = "wfix-v1:"
#: hash-to-uniform denominator: top 12 md5 hex chars → uniform in (0,1]
_WFIXK_DEN = 16**12


@query(
    "weighted_sample_fixed_k",
    f"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY -ln((CAST(('0x' || substr(md5('{_WFIXK_SALT}' || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
                        / CAST({_WFIXK_DEN} AS DOUBLE)) / n_chars,
                    doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {_WFIXK}
""",
)
def q_weighted_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted {_WFIXK}-per-language sample by the exponential race
    (Efraimidis-Spirakis A-ES): each doc draws a deterministic uniform
    u from a salted hash and competes with key ``-ln(u)/w`` (w =
    n_chars, so longer documents win proportionally more often); the k
    smallest keys per stratum are the sample.  This is how you take a
    reproducible size-biased sample of a 100 TB corpus in ONE pass —
    no total, no second scan, no rejection loop; the per-stratum state
    is k rows (WindowGroupLimit), and membership is a pure function of
    (salt, doc_id, weight)."""
    d = _docs(spark, sf_dir)
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(_WFIXK_SALT), F.col("doc_id").cast("string"))), 1, 12
                ),
                16,
                10,
            ).cast("long")
            + 1
        )
        / F.lit(float(_WFIXK_DEN))
    )
    key = -F.log(u) / F.col("n_chars")
    w = W.partitionBy("lang").orderBy(key.asc(), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WFIXK)
        .select("doc_id", "lang")
    )


# --- n-gram LM perplexity proxy ----------------------------------------------


@query(
    "bigram_logprob_scores",
    f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         toks[i] AS a, toks[i+1] AS b
  FROM toks CROSS JOIN (SELECT unnest(range(1, 10000)) AS i)
  WHERE i < len(toks)
),
uni AS (SELECT a, count(*) AS ca FROM bg GROUP BY a),
bi AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY a, b)
SELECT g.doc_id,
       CAST(count(*) AS INT) AS n_bigrams,
       round(avg(ln(CAST(bi.cab AS DOUBLE) / uni.ca)), 4) AS avg_logprob
FROM bg g JOIN bi ON g.a = bi.a AND g.b = bi.b
JOIN uni ON g.a = uni.a
GROUP BY g.doc_id
""",
)
def q_bigram_logprob_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram LM perplexity proxy — the classic corpus quality filter
    (documents whose token transitions are improbable under the
    corpus-wide bigram model are noise): per doc, the mean
    ``ln P(b|a)`` with ``P(b|a) = count(a,b)/count(a)`` estimated from
    the corpus itself.

    Scale shape: the bigram/unigram model tables are vocabulary-sized
    (two aggregations), the scoring join is bigram-keyed, and the final
    per-doc mean is one aggregation — a real KenLM-style filter swaps in
    a pretrained table for `bi`/`uni` and keeps this exact plan."""
    d = _docs(spark, sf_dir)
    toks = tx.tokens("text")
    bg = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.size(toks) - 1),
                F.slice(toks, 2, F.size(toks) - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    uni = bg.groupBy("a").agg(F.count(F.lit(1)).alias("ca"))
    bi = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    return (
        bg.join(bi, ["a", "b"])
        .join(uni, "a")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("cab").cast("double") / F.col("ca"))), 4).alias(
                "avg_logprob"
            ),
        )
    )


# --- Gopher-style repetition metrics -----------------------------------------
#
# The repetition family of quality filters (Rae et al. 2021 "Gopher"
# §A1.1): documents dominated by a repeated n-gram or with low lexical
# diversity are machine-generated/boilerplate and get dropped before
# training.  The corpus has no newlines, so the line-based variants are
# replaced by their token-based analogs over the same whitespace
# tokenization every other text query uses.

_REPETITION_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
g AS (SELECT doc_id,
        list_transform(generate_series(1, len(ts)-1),
                       i -> ts[i] || ' ' || ts[i+1]) AS g2,
        list_transform(generate_series(1, len(ts)-2),
                       i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]) AS g3,
        len(ts) AS n_tokens,
        len(list_distinct(ts)) AS n_distinct
      FROM toks),
c2 AS (SELECT doc_id, gram, count(*) AS c
       FROM (SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY 1, 2),
a2 AS (SELECT doc_id, max(c) AS top2 FROM c2 GROUP BY 1),
c3 AS (SELECT doc_id, gram, count(*) AS c
       FROM (SELECT doc_id, unnest(g3) AS gram FROM g) GROUP BY 1, 2),
a3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3
       FROM c3 GROUP BY 1)
SELECT g.doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       round(CAST(coalesce(a2.top2, 0) AS DOUBLE)
             / greatest(n_tokens - 1, 1), 6) AS top_bigram_frac,
       round(CAST(coalesce(a3.dup3, 0) AS DOUBLE)
             / greatest(n_tokens - 2, 1), 6) AS dup_trigram_frac,
       round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_token_ratio
FROM g LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
"""

#: filter thresholds (chosen non-degenerate on the synthetic corpus: a
#: handful of docs trip each n-gram gate, diversity trips more)
_REP_TOP_BIGRAM = 0.10
_REP_DUP_TRIGRAM = 0.05
_REP_MIN_DIVERSITY = 0.35


def _ngram_multiset(n: int) -> F.Column:
    """Word n-grams WITH multiplicity (the repetition signal — unlike
    dedup shingles, which are deduped per doc)."""
    toks = tx.tokens("text")
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = tx.tokens("text")
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )
    # both gram sizes ride ONE explode, tagged with n, so the per-doc
    # count aggregation is a single map-side-combined shuffle keyed by
    # (doc_id, n, gram) — keys are per-document, so no global hot key
    # exists by construction and the whole pass is JVM codegen
    tag = lambda n, arr: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))
    )
    grams = d.select(
        "doc_id",
        F.explode(
            F.concat(tag(2, _ngram_multiset(2)), tag(3, _ngram_multiset(3)))
        ).alias("e"),
    ).select("doc_id", F.col("e.n").alias("n"), F.col("e.gram").alias("gram"))
    cnt = grams.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("doc_id").agg(
        F.max(F.when(F.col("n") == 2, F.col("c"))).alias("top2"),
        F.sum(
            F.when((F.col("n") == 3) & (F.col("c") > 1), F.col("c")).otherwise(0)
        ).alias("dup3"),
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.round(
            F.coalesce(F.col("top2"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens") - 1, F.lit(1)),
            6,
        ).alias("top_bigram_frac"),
        F.round(
            F.coalesce(F.col("dup3"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens") - 2, F.lit(1)),
            6,
        ).alias("dup_trigram_frac"),
        F.round(
            F.col("n_distinct").cast("double") / F.col("n_tokens"), 6
        ).alias("distinct_token_ratio"),
    )


@query("repetition_metrics", _REPETITION_SQL)
def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: most-frequent-bigram
    coverage, duplicated-trigram coverage, distinct-token ratio.

    Scale shape: one explode over tagged 2/3-gram multisets, one
    (doc_id, n, gram)-keyed count with map-side combine, one per-doc
    fold, broadcast-joinable back to the metadata row.  All keys carry
    doc_id so corpus-wide hot keys cannot exist; everything is built-in
    expressions (zero Python)."""
    return _repetition_metrics(spark, sf_dir)


@query(
    "repetition_filter",
    f"""
SELECT doc_id,
       top_bigram_frac > {_REP_TOP_BIGRAM} AS flag_top_bigram,
       dup_trigram_frac > {_REP_DUP_TRIGRAM} AS flag_dup_trigram,
       distinct_token_ratio < {_REP_MIN_DIVERSITY} AS flag_low_diversity
FROM ({_REPETITION_SQL})
WHERE top_bigram_frac > {_REP_TOP_BIGRAM}
   OR dup_trigram_frac > {_REP_DUP_TRIGRAM}
   OR distinct_token_ratio < {_REP_MIN_DIVERSITY}
""",
)
def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repetition gates as a filter: documents tripping any of the
    three Gopher-style thresholds, with per-gate flags (the audit trail a
    curation pipeline keeps next to every drop decision)."""
    m = _repetition_metrics(spark, sf_dir)
    f_tb = F.col("top_bigram_frac") > _REP_TOP_BIGRAM
    f_dt = F.col("dup_trigram_frac") > _REP_DUP_TRIGRAM
    f_ld = F.col("distinct_token_ratio") < _REP_MIN_DIVERSITY
    return (
        m.select(
            "doc_id",
            f_tb.alias("flag_top_bigram"),
            f_dt.alias("flag_dup_trigram"),
            f_ld.alias("flag_low_diversity"),
        )
        .filter(
            F.col("flag_top_bigram")
            | F.col("flag_dup_trigram")
            | F.col("flag_low_diversity")
        )
    )


# --- temperature-scaled mixture weights --------------------------------------

#: sampling temperature (mT5 / multilingual-pretraining convention:
#: p_s^alpha renormalized — alpha < 1 upsamples small sources)
_MIX_ALPHA = 0.3


@query(
    "mixture_weights_temperature",
    f"""
WITH per AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(text, ' '))) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS t, sum(pow(n_tokens / (SELECT sum(n_tokens) FROM per), {_MIX_ALPHA})) AS z FROM per)
SELECT source,
       CAST(n_docs AS INT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(n_tokens / t, 6) AS natural_share,
       round(pow(n_tokens / t, {_MIX_ALPHA}) / z, 6) AS sample_share,
       round((pow(n_tokens / t, {_MIX_ALPHA}) / z) / (n_tokens / t), 6) AS upsample_factor
FROM per CROSS JOIN tot
""",
)
def q_mixture_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per source (p^α renormalized,
    α={alpha}): the standard recipe for upsampling small sources in a
    pretraining mixture (mT5 §3.2 convention).  Outputs natural token
    share, temperature-adjusted sample share, and the implied
    upsample factor per source.

    Scale shape: one map-side-combined aggregation on the low-cardinality
    source key, then unpartitioned windows over the AGGREGATED frame
    (|sources| rows, not the corpus) for both normalizations — the same
    cheap-place-to-normalize pattern as corpus_mixture_stats.""".format(
        alpha=_MIX_ALPHA
    )
    d = _docs(spark, sf_dir)
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.sum(F.size(tx.tokens("text"))).cast("long").alias("n_tokens"),
    )
    total = W.partitionBy()
    natural = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(total)
    scaled = F.pow(natural, F.lit(_MIX_ALPHA))
    sample = scaled / F.sum(scaled).over(total)
    return per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(natural, 6).alias("natural_share"),
        F.round(sample, 6).alias("sample_share"),
        F.round(sample / natural, 6).alias("upsample_factor"),
    )


# --- deterministic corpus shuffle-shard --------------------------------------

_N_SHARDS = 8
#: portable 60-bit hash of an expression (top 15 hex chars of md5) — the
#: same convention as queries_ext._H64, applied to derived strings here
_SHARD_H = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 15)) AS BIGINT)"
_ORDER_H = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':order'), 1, 15)) AS BIGINT)"


@query(
    "shuffle_shards",
    f"""
SELECT doc_id,
       CAST({_SHARD_H} % {_N_SHARDS} AS INT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY {_SHARD_H} % {_N_SHARDS}
           ORDER BY {_ORDER_H}, doc_id) AS INT) AS pos
FROM documents
""",
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudo-random corpus shuffle into N shards — the
    write-side op that materializes pretraining data in randomized order
    (sequential readers then see an unbiased stream without a training-
    time shuffle buffer holding the corpus).

    shard = hash(doc_id) mod N; position = rank of an independent hash
    within the shard.  Both hashes are the portable md5-derived
    convention, so reruns and engines agree bit-for-bit.  Scale shape:
    the window partitions by shard (each ≈ corpus/N rows) — exactly the
    per-output-file sort a sharded writer performs anyway
    (repartition(N) + sortWithinPartitions on a cluster)."""
    d = _docs(spark, sf_dir)
    sh = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard"))), 1, 15), 16, 10)
        .cast("long") % _N_SHARDS
    )
    ok = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":order"))), 1, 15), 16, 10)
        .cast("long")
    )
    w = W.partitionBy(sh).orderBy(ok, F.col("doc_id"))
    return d.select(
        "doc_id",
        sh.cast("int").alias("shard"),
        F.row_number().over(w).cast("int").alias("pos"),
    )


# --- token-budget subset selection -------------------------------------------

_TOKEN_BUDGET = 20_000


@query(
    "token_budget_select",
    f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS score
  FROM documents
)
SELECT doc_id, n_tokens, score, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM (
  SELECT *, sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM m
)
WHERE cum_tokens <= {_TOKEN_BUDGET}
""",
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-first subset under a token budget: take documents
    in (score DESC, doc_id) order while the running token total stays
    within budget — "give me the best N-billion-token subset" from a
    curation sweep.

    The oracle states the spec as ONE global cumulative window; the Spark
    plan computes the identical set WITHOUT a global single-partition
    sort (the 100 TB scale-killer):

      1. per-score-bucket token totals (map-side-combined aggregation —
         the bucket frame is tiny);
      2. cumulative totals over the AGGREGATED frame only (cheap
         single-partition window over |buckets| rows, the same
         normalize-at-the-top pattern as corpus_mixture_stats);
      3. broadcast-join score offsets back and finish with the two-level
         bucket-offset running sum WITHIN each score
         (functions/windows.py), so cum(doc) = score_offset +
         within-score bucketed running sum.  The inner sum partitions by
         (score, doc-range bucket), not score alone — a degenerate
         corpus where every short document rounds to score=1.0 would
         otherwise recreate the single hot partition in miniature.

    Equality with the flat window holds because the global order
    (score DESC, doc_id) is exactly (bucket order, within-bucket
    order)."""
    from depositaja_spark.functions.windows import bucketed_running_sum

    d = _docs(spark, sf_dir)
    toks = tx.tokens("text")
    m = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6
        ).alias("score"),
    )
    bkt = m.groupBy("score").agg(F.sum("n_tokens").alias("bt"))
    wb = W.orderBy(F.col("score").desc())
    bkt = bkt.select(
        "score", (F.sum("bt").over(wb) - F.col("bt")).alias("cum_before")
    )
    inner = bucketed_running_sum(m, ["score"], "doc_id", "n_tokens", out_col="in_cum")
    return (
        inner.join(F.broadcast(bkt), "score")
        .withColumn("cum_tokens", F.col("cum_before") + F.col("in_cum"))
        .filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select("doc_id", "n_tokens", "score", F.col("cum_tokens").cast("long").alias("cum_tokens"))
    )


# --- end-to-end training export ----------------------------------------------
#
# The flagship composition of the curation surface: clean_corpus
# survivors → overlapping chunking → per-language sequence packing →
# deterministic shard assignment.  One registry entry proves the stages
# COMPOSE (each is individually oracle-checked already), and the oracle
# is built by textually extending the clean_corpus SQL with the
# chunk/pack/shard CTEs so both engines state the same spec end-to-end.

from depositaja_spark.queries_ext import (  # noqa: E402
    _CHUNK_SIZE,
    _CHUNK_STRIDE,
    ORACLE_CHUNK_CAP,
    _clean_corpus_sql,
)

_EXPORT_PACK_TARGET = 512


def _training_export_sql() -> str:
    clean = _clean_corpus_sql().rstrip()
    final = (
        "SELECT e.doc_id, e.predicted_lang, e.n_tokens"
        "\nFROM exact e JOIN keepers USING (doc_id)"
    )
    assert clean.endswith(final), "clean_corpus SQL shape changed"
    prologue = clean[: -len(final)]
    return (
        prologue.rstrip()
        + f""",
survivors AS (
  {final}
),
sdocs AS (
  SELECT d.doc_id, s.predicted_lang, string_split(d.text, ' ') AS toks
  FROM documents d JOIN survivors s USING (doc_id)
),
chunks AS (
  SELECT doc_id, predicted_lang, CAST(i AS INT) AS chunk_id,
         CAST(least(len(toks) - i * {_CHUNK_STRIDE}, {_CHUNK_SIZE}) AS INT) AS n_tokens
  FROM sdocs
  CROSS JOIN (SELECT unnest(range(0, {ORACLE_CHUNK_CAP})) AS i)
  WHERE i < greatest(1, CAST(ceil((len(toks) - {_CHUNK_SIZE})
                                  / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS BIGINT) + 1)
),
runs AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY predicted_lang
                                ORDER BY doc_id, chunk_id
                                ROWS UNBOUNDED PRECEDING) AS cum
  FROM chunks
),
packed AS (
  SELECT doc_id, chunk_id, predicted_lang, n_tokens,
         CAST(floor((cum - n_tokens) / {_EXPORT_PACK_TARGET}) AS BIGINT) AS pack_id
  FROM runs
)
SELECT doc_id, chunk_id, predicted_lang, n_tokens, pack_id,
       CAST(CAST(('0x' || substr(md5(predicted_lang || ':' ||
                 CAST(pack_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % {_N_SHARDS} AS INT) AS shard
FROM packed
"""
    )


@query("training_export", _training_export_sql())
def q_training_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data export: clean_corpus survivors, chunked
    into overlapping {size}-token windows (stride {stride}), packed into
    ~{target}-token bins per predicted language, each bin assigned a
    deterministic output shard.

    Scale shape: cleaning is the already-audited corpus pipeline;
    chunking is row-local (no shuffle); packing states its spec as one
    window per language but is COMPUTED with the two-level bucket-offset
    decomposition (functions/windows.py), so the dominant language never
    collapses onto a single task; shard assignment is a row-local hash.
    The expensive stages all come from audited building blocks — the
    query exists to pin their COMPOSITION under one oracle.""".format(
        size=_CHUNK_SIZE, stride=_CHUNK_STRIDE, target=_EXPORT_PACK_TARGET
    )
    from depositaja_spark.plans.corpus_pipeline import clean_corpus

    docs = _docs(spark, sf_dir)
    survivors = clean_corpus(docs).select("doc_id", "predicted_lang")
    toks = tx.tokens("text")
    n = F.size(F.col("toks"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(_CHUNK_SIZE)) / F.lit(_CHUNK_STRIDE) + 1).cast("int"),
    )
    sdocs = docs.select("doc_id", toks.alias("toks")).join(survivors, "doc_id")
    chunks = sdocs.select(
        "doc_id",
        "predicted_lang",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        F.col("toks"),
    ).select(
        "doc_id",
        "predicted_lang",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.least(
            F.size("toks") - F.col("chunk_id") * _CHUNK_STRIDE, F.lit(_CHUNK_SIZE)
        ).cast("int").alias("n_tokens"),
    )
    from depositaja_spark.functions.cache import tracked_persist
    from depositaja_spark.functions.windows import bucketed_running_sum

    # bucketed_running_sum references its input twice (offset aggregation
    # + join probe); without a persist the whole clean_corpus subtree
    # above executes twice (measured 2x at sf0.1)
    chunks = tracked_persist(chunks)
    packed = bucketed_running_sum(
        chunks,
        ["predicted_lang"],
        "doc_id",
        "n_tokens",
        extra_order_cols=["chunk_id"],
    ).select(
        "doc_id",
        "chunk_id",
        "predicted_lang",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / _EXPORT_PACK_TARGET)
        .cast("long")
        .alias("pack_id"),
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("predicted_lang"),
                        F.lit(":"),
                        F.col("pack_id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    )
    return packed.select(
        "doc_id", "chunk_id", "predicted_lang", "n_tokens", "pack_id",
        shard.cast("int").alias("shard"),
    )


# --- per-source frequency cap -------------------------------------------------
#
# Web corpora are dominated by a few mega-domains; capping documents per
# source is the standard counter (the "domain cap" in every pretraining
# data recipe).  Deterministic: the ≤K keepers per source are the K
# smallest salted hashes, so re-runs and backfills keep the same docs.

_SOURCE_CAP = 10
_SOURCE_CAP_SALT = "srccap-v1:"


@query(
    "source_cap_sample",
    f"""
SELECT doc_id, source
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5('{_SOURCE_CAP_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
WHERE rn <= {_SOURCE_CAP}
""",
)
def q_source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain cap: at most {_SOURCE_CAP} documents per source, chosen by
    salted-hash order.  The rank filter compiles to Spark's two-phase
    WindowGroupLimit (per input partition, each source keeps ≤K rows
    BEFORE the shuffle), so a mega-domain holding half the corpus ships
    K rows per map task, never its whole partition — the same plan
    property test_plan_audit.py enforces for every low-cardinality
    window."""
    d = _docs(spark, sf_dir)
    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit(_SOURCE_CAP_SALT), F.col("doc_id").cast("string"))),
        F.asc("doc_id"),
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SOURCE_CAP)
        .select("doc_id", "source")
    )


# --- per-language token-length outlier pruning --------------------------------
#
# Truncated/garbage fragments and concatenation blobs sit in the tails of
# the per-language length distribution; pruning to [p05, p95] per lang is
# the classic length filter, with thresholds LEARNED from the corpus
# instead of hand-set.

_LEN_LO, _LEN_HI = 0.05, 0.95


@query(
    "token_length_outliers",
    f"""
WITH m AS (
  SELECT doc_id, lang, CAST(len({_TOKS}) AS INT) AS n_tokens FROM documents
),
b AS (
  SELECT lang,
         CAST(quantile_disc(n_tokens, {_LEN_LO}) AS INT) AS lo,
         CAST(quantile_disc(n_tokens, {_LEN_HI}) AS INT) AS hi
  FROM m GROUP BY lang
)
SELECT doc_id, m.lang, n_tokens, lo, hi
FROM m JOIN b ON m.lang = b.lang
WHERE n_tokens >= lo AND n_tokens <= hi
""",
)
def q_token_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-outlier pruning: keep documents whose token
    count lies within that language's [p{lo}, p{hi}] band.

    Scale shape: the per-language bounds are ONE mergeable
    percentile_approx aggregation (map-side partial sketches — exact
    below {acc:,} rows per language and value-identical to DuckDB's
    quantile_disc there, the same exact-regime pin as
    quantile_sketch_values); the bounds frame (one row per language)
    broadcasts back onto the corpus for a scan-local filter.  No window,
    no corpus shuffle — the whole query is two scans + one tiny agg.""".format(
        lo=int(_LEN_LO * 100), hi=int(_LEN_HI * 100), acc=1_000_000
    )
    d = _docs(spark, sf_dir)
    m = d.select("doc_id", "lang", F.size(tx.tokens("text")).cast("int").alias("n_tokens"))
    b = (
        m.groupBy("lang")
        .agg(
            F.percentile_approx("n_tokens", [_LEN_LO, _LEN_HI], 1_000_000).alias("q")
        )
        .select(
            "lang",
            F.col("q")[0].cast("int").alias("lo"),
            F.col("q")[1].cast("int").alias("hi"),
        )
    )
    return (
        m.join(F.broadcast(b), "lang")
        .filter((F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi")))
        .select("doc_id", "lang", "n_tokens", "lo", "hi")
    )


# --- corpus analytics: Zipf-law fit ------------------------------------------
#
# Whether a corpus's term-frequency distribution follows Zipf's law
# (log-freq ≈ intercept + slope·log-rank, slope ≈ −1) is a standard
# pretraining-data health check: heavily templated / machine-generated
# corpora bend the curve.  The fit is closed-form OLS over the top-K
# terms, computed from distributed sums — no driver-side math beyond the
# final 1-row combine.

_ZIPF_TOP = 1000


@query(
    "zipf_law_fit",
    f"""
WITH freq AS (
  SELECT tok, count(*) AS n
  FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
  GROUP BY tok ORDER BY n DESC, tok LIMIT {_ZIPF_TOP}
),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS r FROM freq
),
pts AS (SELECT log10(CAST(r AS DOUBLE)) AS x, log10(CAST(n AS DOUBLE)) AS y
        FROM ranked)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round((count(*) * sum(x*y) - sum(x) * sum(y))
             / (count(*) * sum(x*x) - sum(x) * sum(x)), 6) AS slope,
       round((sum(y) - ((count(*) * sum(x*y) - sum(x) * sum(y))
                        / (count(*) * sum(x*x) - sum(x) * sum(x))) * sum(x))
             / count(*), 6) AS intercept,
       round(pow(count(*) * sum(x*y) - sum(x) * sum(y), 2)
             / ((count(*) * sum(x*x) - sum(x) * sum(x))
                * (count(*) * sum(y*y) - sum(y) * sum(y))), 6) AS r2
FROM pts
""",
)
def q_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of log10(freq) on log10(rank) over the top-1000 corpus
    terms.  Scale shape: the term-frequency aggregation map-side
    combines (vocabulary-sized output, not corpus-sized); top-K is a
    TakeOrdered, so only K rows ever reach the ranking window — its
    single partition holds exactly 1000 rows at ANY corpus size, which
    is the bounded-window exception the plan audit allows.  The five
    OLS sums reduce those K rows to one; rounding to 6 decimals absorbs
    the sub-ulp summation-order difference between engines."""
    d = _docs(spark, sf_dir)
    freq = (
        d.select(F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(_ZIPF_TOP)
    )
    w = W.orderBy(F.desc("n"), F.asc("tok"))
    pts = freq.select(
        F.log10(F.row_number().over(w).cast("double")).alias("x"),
        F.log10(F.col("n").cast("double")).alias("y"),
    )
    cnt = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    syy = F.sum(F.col("y") * F.col("y"))
    slope_num = cnt * sxy - sx * sy
    slope_den = cnt * sxx - sx * sx
    return pts.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(slope_num / slope_den, 6).alias("slope"),
        F.round((sy - (slope_num / slope_den) * sx) / cnt, 6).alias("intercept"),
        F.round(
            F.pow(slope_num, F.lit(2)) / (slope_den * (cnt * syy - sy * sy)), 6
        ).alias("r2"),
    )


# --- pipeline observability: dedup rate by source ----------------------------


@query(
    "dedup_rate_by_source",
    """
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 6)
         AS dup_rate,
       round(CAST(sum(CAST(n_chars AS BIGINT)) AS DOUBLE) / count(*), 2)
         AS avg_chars
FROM documents
GROUP BY source
""",
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication report — the observability row a curation
    run emits before choosing per-source dedup budgets.  count(DISTINCT
    md5) shuffles (source, hash) pairs once with map-side partial
    dedup; the integer char sum is exact, so only the final divisions
    are doubles (deterministic numerator/denominator → bit-stable)."""
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5("text")).alias("n_unique"),
        F.round(
            F.lit(1.0)
            - F.count_distinct(F.md5("text")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
        F.round(
            F.sum(F.col("n_chars").cast("bigint")).cast("double") / F.count(F.lit(1)),
            2,
        ).alias("avg_chars"),
    )


# --- embedding hygiene: per-label norm statistics ----------------------------
#
# Zero / degenerate / wildly-scaled vectors poison cosine ANN and
# near-dup thresholds; this is the standard pre-index sanity scan.

_NORM = """
sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
     i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
"""


@query(
    "embedding_norm_stats",
    f"""
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(min({_NORM}), 6) AS min_norm,
       round(max({_NORM}), 6) AS max_norm,
       round(sum({_NORM}) / count(*), 6) AS avg_norm
FROM embeddings
GROUP BY label
""",
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm distribution over the embedding table.  The
    norm is a row-local JVM fold (aggregate over the array — no UDF, no
    shuffle); the group aggregation is the only exchange.  min/max are
    exact value selections; the mean's summation-order noise is
    absorbed by round-6, same convention as the cosine oracles."""
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return (
        e.select("label", norm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.round(F.sum("nrm") / F.count(F.lit(1)), 6).alias("avg_norm"),
        )
    )


# --- CCNet-style perplexity bucketing ----------------------------------------
#
# CCNet (Wenzek et al. 2020) splits each language's corpus into
# head/middle/tail by LM perplexity terciles; training recipes then
# keep head+middle or reweight by bucket.  The LM here is the corpus
# bigram model bigram_logprob_scores already pins; on a real pipeline a
# pretrained KenLM table is swapped in and the plan is unchanged.

_PPL_ACCURACY = 1_000_000  # exact-regime pin, same as quantile_sketch_values

_BIGRAM_SCORES_SQL = f"""
toks AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, toks[i] AS a, toks[i+1] AS b
  FROM toks CROSS JOIN (SELECT unnest(range(1, 10000)) AS i)
  WHERE i < len(toks)
),
uni AS (SELECT a, count(*) AS ca FROM bg GROUP BY a),
bi AS (SELECT a, b, count(*) AS cab FROM bg GROUP BY a, b),
scores AS (
  SELECT g.doc_id, round(avg(ln(CAST(bi.cab AS DOUBLE) / uni.ca)), 4) AS avg_logprob
  FROM bg g JOIN bi ON g.a = bi.a AND g.b = bi.b
  JOIN uni ON g.a = uni.a
  GROUP BY g.doc_id
)"""


@query(
    "perplexity_buckets",
    f"""
WITH {_BIGRAM_SCORES_SQL},
langed AS (
  SELECT s.doc_id, d.lang, s.avg_logprob
  FROM scores s JOIN documents d ON s.doc_id = d.doc_id
),
bounds AS (
  SELECT lang,
         quantile_disc(avg_logprob, CAST(1 AS DOUBLE)/3) AS q33,
         quantile_disc(avg_logprob, CAST(2 AS DOUBLE)/3) AS q67
  FROM langed GROUP BY lang
)
SELECT doc_id, l.lang, avg_logprob,
       CASE WHEN avg_logprob >= q67 THEN 'head'
            WHEN avg_logprob >= q33 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM langed l JOIN bounds b ON l.lang = b.lang
""",
)
def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language head/middle/tail split by bigram-LM score terciles
    (higher mean logprob = lower perplexity = head).

    Scale shape: scores come from the vocabulary-sized bigram model
    (see bigram_logprob_scores); the tercile bounds are a per-language
    percentile_approx over the ALREADY-AGGREGATED one-row-per-doc score
    frame — GK sketch state, no sort, exact below _PPL_ACCURACY rows
    per language and value-identical to DuckDB's quantile_disc there
    (both return an observed value at the target rank; the rank is
    exact because scores are pre-rounded to 4 decimals, so both engines
    quantile the identical multiset).  The bounds frame (one row per
    language) broadcasts back for a scan-local CASE — no window, no
    corpus shuffle on the low-cardinality lang key."""
    scores = q_bigram_logprob_scores(spark, sf_dir).select("doc_id", "avg_logprob")
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    langed = scores.join(d, "doc_id")
    bounds = (
        langed.groupBy("lang")
        .agg(
            F.percentile_approx(
                "avg_logprob", [1.0 / 3.0, 2.0 / 3.0], _PPL_ACCURACY
            ).alias("q")
        )
        .select("lang", F.col("q")[0].alias("q33"), F.col("q")[1].alias("q67"))
    )
    return langed.join(F.broadcast(bounds), "lang").select(
        "doc_id",
        "lang",
        "avg_logprob",
        F.when(F.col("avg_logprob") >= F.col("q67"), "head")
        .when(F.col("avg_logprob") >= F.col("q33"), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


# --- mixture planning: per-source epochs under a token budget ----------------
#
# The data-mixing recipe behind LLaMA/Gopher-style training runs:
# temperature-weight the sources, scale to the training token budget,
# and cap repetition at MAX_EPOCHS passes over any single source
# (repeating data beyond ~4 epochs measurably degrades models —
# Muennighoff et al. 2023).  Everything is computed from exact integer
# token sums; the frame never exceeds one row per source.

_EPOCH_ALPHA = 0.7     # mixture temperature (same recipe as mixture_weights)
_BUDGET_MULT = 2.0     # training budget = 2x total corpus tokens
_MAX_EPOCHS = 4.0


@query(
    "source_epoch_plan",
    f"""
WITH per_src AS (
  SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM per_src),
pw AS (
  SELECT source, n_tokens, pow(n_tokens / total, {_EPOCH_ALPHA}) AS pa, total
  FROM per_src CROSS JOIN tot
),
z AS (SELECT sum(pa) AS zsum FROM pw)
SELECT source, n_tokens,
       round(pa / zsum, 6) AS weight,
       round(least(pa / zsum * {_BUDGET_MULT} * total / n_tokens,
                   {_MAX_EPOCHS}), 4) AS epochs,
       round(least(pa / zsum * {_BUDGET_MULT} * total,
                   {_MAX_EPOCHS} * n_tokens), 2) AS effective_tokens
FROM pw CROSS JOIN z
""",
)
def q_source_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source epoch plan: temperature-weighted share of a
    {_BUDGET_MULT}x-corpus token budget, repetition capped at
    {_MAX_EPOCHS} epochs.  One corpus aggregation produces the
    source-sized frame; the total and the normalizer are 1-row
    re-aggregations of THAT frame broadcast back (the scalar-cutoff
    pattern) — the corpus is scanned once regardless of sf."""
    d = _docs(spark, sf_dir)
    per_src = d.groupBy("source").agg(
        F.sum(F.size(tx.tokens("text"))).cast("bigint").alias("n_tokens")
    )
    tot = per_src.agg(F.sum("n_tokens").cast("double").alias("total"))
    pw = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.pow(F.col("n_tokens") / F.col("total"), F.lit(_EPOCH_ALPHA)).alias("pa"),
        "total",
    )
    z = pw.agg(F.sum("pa").alias("zsum"))
    wanted = F.col("pa") / F.col("zsum") * F.lit(_BUDGET_MULT) * F.col("total")
    return pw.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.round(F.col("pa") / F.col("zsum"), 6).alias("weight"),
        F.round(
            F.least(wanted / F.col("n_tokens"), F.lit(_MAX_EPOCHS)), 4
        ).alias("epochs"),
        F.round(
            F.least(wanted, F.lit(_MAX_EPOCHS) * F.col("n_tokens")), 2
        ).alias("effective_tokens"),
    )


# --- leakage-safe train/val split --------------------------------------------
#
# Splitting by per-document hash (train_val_split) leaks: a near-
# duplicate pair straddling the boundary puts a paraphrase of a
# validation document into training, inflating eval.  The fix is to
# split by NEAR-DUP CLUSTER — the whole cluster lands on one side, so
# no validation document has a near-duplicate in train by construction.

_CSPLIT_SALT = "split-cluster-v1:"
_CSPLIT_HEX = "e5"  # same ~90/10 ratio as train_val_split


def _leakage_safe_sql() -> str:
    from depositaja_spark.queries_ext import _CLUSTERS_SQL

    return f"""
SELECT doc_id, cluster_id,
       CASE WHEN substr(md5('{_CSPLIT_SALT}' || CAST(cluster_id AS VARCHAR)), 1, 2)
                 <= '{_CSPLIT_HEX}'
            THEN 'train' ELSE 'val' END AS split
FROM ({_CLUSTERS_SQL}) c
"""


@query("leakage_safe_split", _leakage_safe_sql())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val split: assignment is hashed from the
    near-dup CLUSTER representative, not the document id, so an entire
    near-duplicate cluster lands on one side — no validation document
    has a training near-duplicate by construction (the leakage the
    plain hash split cannot prevent).  Same salted-hash determinism as
    train_val_split: membership depends only on (salt, cluster_id),
    stable under re-runs and incremental arrivals as long as the
    cluster representative is stable.  Plan = dedup_clusters (banded
    pair graph + label propagation) plus one row-local projection."""
    from depositaja_spark.functions.graph import dedup_clusters as _dc
    from depositaja_spark.queries_ext import _docs as _docs_ext

    docs = _docs_ext(spark, sf_dir)
    clusters = _dc(docs, dd.jaccard_pairs(docs, n=3, threshold=0.1))
    frac = F.substring(
        F.md5(F.concat(F.lit(_CSPLIT_SALT), F.col("cluster_id").cast("string"))), 1, 2
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.when(frac <= _CSPLIT_HEX, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


# --- Bloom-prefiltered incremental exact dedup -------------------------------

#: filter sizing for the registered query: the sf0.1 history holds ~24k
#: distinct shingles, so 2^19 bits ≈ 21 bits/key (a 64 KB bitmap) —
#: past the 16-bit/key design point; production sizes m from the history
#: cardinality at build time (undersizing only raises the FP rate, i.e.
#: verify-join traffic — never correctness).
_BLOOM_M_BITS = 1 << 19


def _bloom_sql() -> str:
    from depositaja_spark.queries_ext import _SHINGLES_SQL

    return f"""
WITH {_SHINGLES_SQL},
hist AS (SELECT DISTINCT shingle FROM shingles WHERE doc_id % {_INC_MOD} <> 0),
inc AS (SELECT doc_id, shingle FROM shingles WHERE doc_id % {_INC_MOD} = 0)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (WHERE h.shingle IS NOT NULL) AS BIGINT) AS n_in_history
FROM inc i LEFT JOIN hist h USING (shingle)
GROUP BY doc_id
"""


@query("incremental_dedup_bloom", _bloom_sql())
def q_incremental_dedup_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental n-gram contamination through the Bloom prefilter
    (functions/bloom.py): the history's distinct-shingle set is
    compressed to a bit_or-aggregated bitmap (built once, mergeable
    day-over-day), each increment shingle probes the bitmap instead of
    the history, and only the maybe-member sliver reaches the exact
    verify join — the shape that keeps daily ingest dedup from
    re-shuffling a 10^10-key history every batch.  Per increment doc:
    total shingles and how many already exist in the history (the
    incremental analog of ``decontaminate``'s overlap count).  The
    verify join restores exactness (Bloom has no false negatives), so
    the result — and the oracle — is the plain exact membership SQL."""
    from depositaja_spark.functions.bloom import bloom_prefilter_members

    sh = dd.shingles(_docs(spark, sf_dir), n=3)
    hist = sh.filter(F.col("doc_id") % _INC_MOD != 0).select("shingle")
    inc = sh.filter(F.col("doc_id") % _INC_MOD == 0)
    member = bloom_prefilter_members(hist, inc, "shingle", m_bits=_BLOOM_M_BITS)
    return member.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("is_member").cast("long")).alias("n_in_history"),
    )


# --- BM25 retrieval scoring ---------------------------------------------------
#
# The classic keyword-retrieval ranking (Robertson/Spärck Jones) — the
# engine-side primitive behind corpus search, quality probes ("find docs
# about X"), and hard-negative mining.  TF-IDF above extracts keywords
# PER DOC; BM25 ranks docs FOR A QUERY, with length normalization and tf
# saturation.  Everything is relational: two keyed aggregations (tf on
# (doc, term), df on term), a 1-row corpus-stats broadcast, a ≤|Q|-row
# idf frame AQE will broadcast, and a global top-k that plans as
# TakeOrderedAndProject (no global sort).

_BM25_TERMS = ("spark", "window", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@query(
    "bm25_search",
    f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
       FROM toks WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, tok),
df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
       FROM toks WHERE tok IN ({_BM25_TERMS_SQL}) GROUP BY tok),
idf AS (SELECT tok, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
        FROM df CROSS JOIN stats),
s AS (
  SELECT tf.doc_id,
         sum(idf.idf * tf.tf * ({_BM25_K1} + 1.0)
             / (tf.tf + {_BM25_K1}
                * (1.0 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl))) AS sc
  FROM tf
  JOIN idf USING (tok)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, round(sc, 6) AS score
FROM s ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
""",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BM25_TOPK} documents by BM25 for the fixed query terms
    (k1={_BM25_K1}, b={_BM25_B}; deterministic doc_id tie-break).

    Scale shape: the tf aggregation filters to query terms BEFORE the
    (doc, term) shuffle, so the exchanged frame is |Q|-bounded per doc;
    df/idf are ≤|Q| rows (broadcast by AQE); doc lengths are one keyed
    aggregation; the final ranking is TakeOrderedAndProject.  In a real
    search deployment tf comes from a prebuilt inverted index — this is
    the query-time plan over raw text."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.explode(tx.tokens("text")).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    qt = toks.filter(F.col("tok").isin(*_BM25_TERMS))
    tf = qt.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    df = qt.groupBy("tok").agg(F.count_distinct("doc_id").cast("double").alias("df"))
    idf = df.crossJoin(F.broadcast(stats)).select(
        "tok",
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias("idf"),
    )
    norm = 1.0 - _BM25_B
    contrib = (
        tf.join(idf, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (_BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + _BM25_K1 * (norm + _BM25_B * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


# --- distribution drift: per-source token-distribution divergence -------------
#
# The corpus-monitoring question "did source X's text change?" is a
# divergence between token distributions.  Per source s with smoothed
# unigram distribution p_s and corpus-complement distribution q_s:
#   KL(p_s ‖ q_s)      — the classic drift score (asymmetric)
#   JS(p_s, q_s)       — bounded symmetric variant (√JS is a metric)
#
# Support is CAPPED: a web corpus's token vocabulary is 10^8–10^9, so
# densifying against the full vocabulary (|S|·V cells) is a scale-killer
# at 100 sources.  Instead: the top-V tokens by global count form the
# head support (deterministic tie-break on token), and the entire tail
# folds into one aggregated OTHER cell per source.  The KL/JS math is
# exact over the capped support {head tokens} ∪ {OTHER}; smoothing sees
# nv = |head| + 1[tail nonempty] support cells.  The dense frame is
# |S|·(V+1) rows — bounded by the cap, independent of corpus AND
# vocabulary size.  Top-V itself is a TakeOrderedAndProject (distributed
# partial top-k, no global sort).

_DRIFT_A = 0.5  # additive smoothing per support cell
# Support cap.  Production would use ~2^16; pinned to 16 here so the
# sf-fixture vocabulary (31 tokens at sf0.01) overflows the cap and the
# tail-fold path is exercised — not just the degenerate head-only case.
_DRIFT_TOPV = 16


# --- weak supervision: labeling-function votes --------------------------------
#
# Snorkel-style programmatic labeling: k cheap heuristic labeling
# functions each vote keep(+1)/abstain(0)/drop(−1) per document; the
# aggregated vote table (per-LF votes + majority + margin) is what a
# label model trains on, and the majority vote alone is the standard
# cold-start quality filter.  Every LF below is INTEGER arithmetic only
# (ratios compared via cross-multiplication), so engine parity is exact
# by construction — no float thresholds anywhere.

_WEAK_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         CAST(len({_TOKS}) AS BIGINT) AS n_tok,
         CAST(len(list_filter({_TOKS}, t -> list_contains({_STOP}, t))) AS BIGINT)
           AS n_stop,
         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(text) AS BIGINT) AS n_char
  FROM documents
),
rep AS (
  SELECT doc_id, max(c) AS max_tok
  FROM (SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
        GROUP BY doc_id, token)
  GROUP BY doc_id
),
votes AS (
  SELECT b.doc_id,
         CASE WHEN b.n_tok >= 40 THEN 1 WHEN b.n_tok < 15 THEN -1 ELSE 0 END
           AS v_len,
         CASE WHEN b.n_stop * 10 > b.n_tok * 7 THEN -1
              WHEN b.n_stop * 10 >= b.n_tok AND b.n_stop * 10 <= b.n_tok * 6
                THEN 1 ELSE 0 END AS v_stop,
         CASE WHEN b.lang = 'en' THEN 1 ELSE 0 END AS v_lang,
         CASE WHEN r.max_tok * 5 >= b.n_tok THEN -1
              WHEN r.max_tok * 10 <= b.n_tok THEN 1 ELSE 0 END AS v_rep,
         CASE WHEN b.n_alpha * 10 >= b.n_char * 7 THEN 1
              WHEN b.n_alpha * 2 < b.n_char THEN -1 ELSE 0 END AS v_alpha
  FROM base b JOIN rep r USING (doc_id)
)
SELECT doc_id, v_len, v_stop, v_lang, v_rep, v_alpha,
       CAST(v_len + v_stop + v_lang + v_rep + v_alpha AS INT) AS vote_sum,
       CAST(CASE WHEN v_len + v_stop + v_lang + v_rep + v_alpha > 0 THEN 1
                 WHEN v_len + v_stop + v_lang + v_rep + v_alpha < 0 THEN -1
                 ELSE 0 END AS INT) AS majority,
       CAST((CASE WHEN v_len = 0 THEN 1 ELSE 0 END)
          + (CASE WHEN v_stop = 0 THEN 1 ELSE 0 END)
          + (CASE WHEN v_lang = 0 THEN 1 ELSE 0 END)
          + (CASE WHEN v_rep = 0 THEN 1 ELSE 0 END)
          + (CASE WHEN v_alpha = 0 THEN 1 ELSE 0 END) AS INT) AS n_abstain
FROM votes
"""


@query("weak_label_votes", _WEAK_SQL)
def q_weak_label_votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weak-supervision vote table: five heuristic labeling functions
    (length, stopword band, language, repetition, alpha ratio) each vote
    keep/abstain/drop per document; output carries the per-LF votes, the
    vote sum, the majority label, and the abstain count — the input a
    Snorkel-style label model consumes, and a usable cold-start filter
    on its own.

    Scale shape: four of the five LFs are scan-local integer expressions
    in one codegen stage; the repetition LF needs the per-document max
    token multiplicity — one (doc, token)-keyed count and a doc-keyed
    max joined back (the inner join means a document with NULL text —
    zero exploded tokens — gets no vote row; the oracle mirrors the
    same join, and the fixture has none).  All thresholds compare via
    cross-multiplication, so there is no float anywhere in the plan."""
    docs = _docs(spark, sf_dir)
    toks = tx.tokens("text")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tok"),
        tx.stopword_hits(toks, tx.STOPWORDS_EN).cast("long").alias("n_stop"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).cast("long").alias("n_alpha"),
        F.length("text").cast("long").alias("n_char"),
    )
    rep = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_tok"))
    )
    v_len = (
        F.when(F.col("n_tok") >= 40, 1).when(F.col("n_tok") < 15, -1).otherwise(0)
    )
    v_stop = (
        F.when(F.col("n_stop") * 10 > F.col("n_tok") * 7, -1)
        .when(
            (F.col("n_stop") * 10 >= F.col("n_tok"))
            & (F.col("n_stop") * 10 <= F.col("n_tok") * 6),
            1,
        )
        .otherwise(0)
    )
    v_lang = F.when(F.col("lang") == "en", 1).otherwise(0)
    v_rep = (
        F.when(F.col("max_tok") * 5 >= F.col("n_tok"), -1)
        .when(F.col("max_tok") * 10 <= F.col("n_tok"), 1)
        .otherwise(0)
    )
    v_alpha = (
        F.when(F.col("n_alpha") * 10 >= F.col("n_char") * 7, 1)
        .when(F.col("n_alpha") * 2 < F.col("n_char"), -1)
        .otherwise(0)
    )
    votes = base.join(rep, "doc_id").select(
        "doc_id",
        v_len.alias("v_len"),
        v_stop.alias("v_stop"),
        v_lang.alias("v_lang"),
        v_rep.alias("v_rep"),
        v_alpha.alias("v_alpha"),
    )
    s = (
        F.col("v_len")
        + F.col("v_stop")
        + F.col("v_lang")
        + F.col("v_rep")
        + F.col("v_alpha")
    )
    n_abstain = sum(
        F.when(F.col(c) == 0, 1).otherwise(0)
        for c in ["v_len", "v_stop", "v_lang", "v_rep", "v_alpha"]
    )
    return votes.select(
        "doc_id",
        "v_len",
        "v_stop",
        "v_lang",
        "v_rep",
        "v_alpha",
        s.cast("int").alias("vote_sum"),
        F.when(s > 0, 1).when(s < 0, -1).otherwise(0).cast("int").alias("majority"),
        n_abstain.cast("int").alias("n_abstain"),
    )


from depositaja_spark.functions.drift import (  # noqa: E402
    PSI_BINS as _PSI_BINS,
    PSI_SMOOTH as _PSI_A,
    psi_bin_col,
    psi_bin_sql,
)


@query(
    "psi_value_drift",
    f"""
WITH ev AS (
  SELECT event_type, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
),
tr AS (SELECT CAST(min(ts_s) + max(ts_s) AS DOUBLE) / 2 AS tmid FROM ev),
rng AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx
  FROM ev CROSS JOIN tr WHERE ts_s < tmid GROUP BY 1
),
binned AS (
  SELECT e.event_type,
         CASE WHEN e.ts_s < tr.tmid THEN 0 ELSE 1 END AS late,
         {psi_bin_sql('e.value', 'r.mn', 'r.mx', _PSI_BINS)} AS bin
  FROM ev e CROSS JOIN tr JOIN rng r ON r.event_type = e.event_type
),
grid AS (
  SELECT t.event_type, g.bin, p.late
  FROM (SELECT DISTINCT event_type FROM ev) t
  CROSS JOIN (SELECT unnest(range(0, {_PSI_BINS})) AS bin) g
  CROSS JOIN (SELECT unnest([0, 1]) AS late) p
),
cells AS (
  SELECT g.event_type, g.late, g.bin, CAST(coalesce(c.n, 0) AS DOUBLE) AS n
  FROM grid g
  LEFT JOIN (SELECT event_type, late, bin, count(*) AS n
             FROM binned GROUP BY 1, 2, 3) c
    ON c.event_type = g.event_type AND c.late = g.late AND c.bin = g.bin
),
tots AS (SELECT event_type, late, sum(n) AS t FROM cells GROUP BY 1, 2),
props AS (
  SELECT c.event_type, c.bin,
         max(CASE WHEN c.late = 0
                  THEN (c.n + {_PSI_A}) / (t0.t + {_PSI_A * _PSI_BINS}) END) AS p_e,
         max(CASE WHEN c.late = 1
                  THEN (c.n + {_PSI_A}) / (t0.t + {_PSI_A * _PSI_BINS}) END) AS p_l
  FROM cells c JOIN tots t0 ON t0.event_type = c.event_type AND t0.late = c.late
  GROUP BY 1, 2
)
SELECT event_type, round(sum((p_l - p_e) * ln(p_l / p_e)), 6) AS psi
FROM props GROUP BY 1
""",
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type — the numeric sibling of
    source_token_divergence: did the `value` distribution shift between
    the first and second half of the time range?  PSI =
    Σ_bins (p_late − p_early)·ln(p_late/p_early) over 10 fixed-width
    bins fitted on the EARLY (baseline) period,
    with additive smoothing so empty cells are well-defined (the
    standard monitoring rule of thumb: <0.1 stable, >0.25 shifted).

    Scale shape: one pass bins every event (scan-local arithmetic
    against a broadcast ≤|types|-row range frame and a 1-row time-split
    scalar); the cell grid is |types|×bins×2 — bounded by
    construction, never event-sized; every divergence term divides
    exact integer counts, so the only float sum is over the bin count
    per type."""
    from depositaja_spark.sources import load_table

    b = float(_PSI_BINS)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.col("ts").cast("long").alias("ts_s")
    )
    tr = ev.agg(
        ((F.min("ts_s") + F.max("ts_s")).cast("double") / 2).alias("tmid")
    )
    with_mid = ev.crossJoin(F.broadcast(tr))
    rng = (
        with_mid.filter(F.col("ts_s") < F.col("tmid"))
        .groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    )
    binned = (
        with_mid.join(F.broadcast(rng), "event_type")
        .select(
            "event_type",
            F.when(F.col("ts_s") < F.col("tmid"), 0).otherwise(1).alias("late"),
            psi_bin_col(
                F.col("value"), F.col("mn"), F.col("mx"), _PSI_BINS
            ).alias("bin"),
        )
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
            )
        )
        .crossJoin(
            F.broadcast(spark.range(2).select(F.col("id").alias("late")))
        )
    )
    counts = binned.groupBy("event_type", "late", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    cells = grid.join(counts, ["event_type", "late", "bin"], "left").select(
        "event_type",
        "late",
        "bin",
        F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("n"),
    )
    tots = cells.groupBy("event_type", "late").agg(F.sum("n").alias("t"))
    a = _PSI_A
    smoothed = cells.join(tots, ["event_type", "late"]).select(
        "event_type",
        "bin",
        "late",
        ((F.col("n") + a) / (F.col("t") + a * b)).alias("p"),
    )
    props = smoothed.groupBy("event_type", "bin").agg(
        F.max(F.when(F.col("late") == 0, F.col("p"))).alias("p_e"),
        F.max(F.when(F.col("late") == 1, F.col("p"))).alias("p_l"),
    )
    return props.groupBy("event_type").agg(
        F.round(
            F.sum((F.col("p_l") - F.col("p_e")) * F.log(F.col("p_l") / F.col("p_e"))),
            6,
        ).alias("psi")
    )


@query(
    "source_token_divergence",
    f"""
WITH tok AS (SELECT source, unnest({_TOKS}) AS token FROM documents),
per AS (SELECT source, token, count(*) AS n FROM tok GROUP BY 1, 2),
gl AS (SELECT token, sum(n) AS nt FROM per GROUP BY 1),
head AS (SELECT token, nt FROM gl ORDER BY nt DESC, token LIMIT {_DRIFT_TOPV}),
sc AS (SELECT (SELECT sum(nt) FROM gl) - (SELECT sum(nt) FROM head) AS tail_nt,
              (SELECT count(*) FROM head) AS nh),
srcs AS (SELECT DISTINCT source FROM documents),
head_cells AS (
  SELECT s.source,
         CAST(coalesce(p.n, 0) AS DOUBLE) AS n_in,
         CAST(h.nt - coalesce(p.n, 0) AS DOUBLE) AS n_out
  FROM srcs s
  CROSS JOIN head h
  LEFT JOIN per p ON p.source = s.source AND p.token = h.token
),
src_tot AS (
  SELECT s.source, coalesce(t.st, 0) AS st
  FROM srcs s LEFT JOIN (SELECT source, sum(n) AS st FROM per GROUP BY 1) t
    ON t.source = s.source
),
src_head AS (SELECT source, sum(n_in) AS sh FROM head_cells GROUP BY 1),
other_cells AS (
  SELECT t.source,
         CAST(t.st - h.sh AS DOUBLE) AS n_in,
         CAST(sc.tail_nt - (t.st - h.sh) AS DOUBLE) AS n_out
  FROM src_tot t JOIN src_head h USING (source) CROSS JOIN sc
  WHERE sc.tail_nt > 0
),
cells AS (SELECT * FROM head_cells UNION ALL SELECT * FROM other_cells),
tots AS (
  SELECT source, sum(n_in) AS t_in, sum(n_out) AS t_out
  FROM cells GROUP BY source
),
v AS (
  SELECT CAST(nh + (CASE WHEN tail_nt > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS nv
  FROM sc
),
p AS (
  SELECT c.source,
         (c.n_in + {_DRIFT_A}) / (tots.t_in + {_DRIFT_A} * v.nv) AS p,
         (c.n_out + {_DRIFT_A}) / (tots.t_out + {_DRIFT_A} * v.nv) AS q
  FROM cells c JOIN tots USING (source) CROSS JOIN v
)
SELECT source,
       round(sum(p * ln(p / q)), 6) AS kl,
       round(sum(0.5 * p * ln(p / ((p + q) / 2))
                 + 0.5 * q * ln(q / ((p + q) / 2))), 6) AS js
FROM p GROUP BY source
""",
)
def q_source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL and Jensen-Shannon divergence between the source's
    smoothed token distribution and the rest of the corpus — the
    distribution-shift monitor a continuously-fed pipeline runs per
    source per day.

    Scale shape (round-7 fix of the r6 verdict flag): support capped to
    the top-V (``_DRIFT_TOPV``) tokens by global count, with the entire
    vocabulary tail folded into one aggregated OTHER cell per source —
    the dense frame is |S|·(V+1) rows regardless of vocabulary size
    (the r6 version densified against the UNCAPPED vocabulary: 10^10+
    cells on a web corpus).  Top-V is a TakeOrderedAndProject (partial
    top-k, no global sort); tail/nv scalars are a 1-row broadcast; the
    KL/JS fold is exact over the capped support."""
    from depositaja_spark.functions.cache import tracked_persist

    docs = _docs(spark, sf_dir)
    tok = docs.select("source", F.explode(tx.tokens("text")).alias("token"))
    # persisted: the (source, token) counts feed the global-token totals,
    # the head-cell join, and the per-source totals — Catalyst would
    # re-explode the corpus once per branch
    per = tracked_persist(
        tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n"))
    )
    gl = per.groupBy("token").agg(F.sum("n").alias("nt"))
    # deterministic top-V: TakeOrderedAndProject, tie-break on token
    head = F.broadcast(
        gl.orderBy(F.desc("nt"), F.asc("token")).limit(_DRIFT_TOPV)
    )
    # 1-row scalar frame: global tail mass + head width
    sc = (
        gl.agg(F.sum("nt").alias("total"))
        .crossJoin(head.agg(F.sum("nt").alias("ht"), F.count(F.lit(1)).alias("nh")))
        .select(
            (F.col("total") - F.col("ht")).alias("tail_nt"),
            F.col("nh"),
        )
    )
    srcs = docs.select("source").distinct()
    head_cells = tracked_persist(
        srcs.crossJoin(head)
        .join(per, ["source", "token"], "left")
        .select(
            "source",
            F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("n_in"),
            (F.col("nt") - F.coalesce(F.col("n"), F.lit(0))).cast("double").alias("n_out"),
        )
    )
    src_tot = srcs.join(
        per.groupBy("source").agg(F.sum("n").alias("st")), "source", "left"
    ).select("source", F.coalesce(F.col("st"), F.lit(0)).alias("st"))
    src_head = head_cells.groupBy("source").agg(F.sum("n_in").alias("sh"))
    other_cells = (
        src_tot.join(src_head, "source")
        .crossJoin(F.broadcast(sc))
        .filter(F.col("tail_nt") > 0)
        .select(
            "source",
            (F.col("st") - F.col("sh")).cast("double").alias("n_in"),
            (F.col("tail_nt") - (F.col("st") - F.col("sh"))).cast("double").alias("n_out"),
        )
    )
    cells = head_cells.unionByName(other_cells)
    nv = sc.select(
        (F.col("nh") + F.when(F.col("tail_nt") > 0, 1).otherwise(0))
        .cast("double")
        .alias("nv")
    )
    tots = cells.groupBy("source").agg(
        F.sum("n_in").alias("t_in"), F.sum("n_out").alias("t_out")
    )
    a = _DRIFT_A
    pq = (
        cells.join(tots, "source")
        .crossJoin(F.broadcast(nv))
        .select(
            "source",
            ((F.col("n_in") + a) / (F.col("t_in") + a * F.col("nv"))).alias("p"),
            ((F.col("n_out") + a) / (F.col("t_out") + a * F.col("nv"))).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    return pq.groupBy("source").agg(
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 6).alias("kl"),
        F.round(
            F.sum(
                0.5 * F.col("p") * F.log(F.col("p") / m)
                + 0.5 * F.col("q") * F.log(F.col("q") / m)
            ),
            6,
        ).alias("js"),
    )


_KAPPA_LFS = ("v_len", "v_stop", "v_lang", "v_rep", "v_alpha")


def _kappa_sql() -> str:
    # reuse the exact vote CTE chain from _WEAK_SQL (everything up to the
    # final SELECT), so the two queries can never disagree on what an LF
    # voted
    prefix = _WEAK_SQL[: _WEAK_SQL.index("\nSELECT doc_id, v_len")]
    melt = "\nUNION ALL ".join(
        f"SELECT doc_id, '{lf}' AS lf, {lf} AS vote FROM votes"
        for lf in _KAPPA_LFS
    )
    return f"""{prefix},
m AS ({melt}),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM votes),
marg AS (SELECT lf, vote, CAST(count(*) AS DOUBLE) AS c FROM m GROUP BY 1, 2),
agree AS (SELECT a.lf AS lf_a, b.lf AS lf_b,
                 CAST(sum(CASE WHEN a.vote = b.vote THEN 1 ELSE 0 END) AS DOUBLE)
                   AS agr
          FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.lf < b.lf
          GROUP BY 1, 2),
chance AS (SELECT ma.lf AS lf_a, mb.lf AS lf_b, sum(ma.c * mb.c) AS pp
           FROM marg ma JOIN marg mb ON ma.vote = mb.vote AND ma.lf < mb.lf
           GROUP BY 1, 2)
SELECT a.lf_a, a.lf_b,
       round(a.agr / n.n, 6) AS po,
       round(coalesce(c.pp, 0) / (n.n * n.n), 6) AS pe,
       CASE WHEN coalesce(c.pp, 0) >= n.n * n.n THEN NULL
            ELSE round((a.agr / n.n - coalesce(c.pp, 0) / (n.n * n.n))
                       / (1 - coalesce(c.pp, 0) / (n.n * n.n)), 6) END AS kappa
FROM agree a
LEFT JOIN chance c ON c.lf_a = a.lf_a AND c.lf_b = a.lf_b
CROSS JOIN n
"""


@query("labeler_agreement_kappa", _kappa_sql())
def q_labeler_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between every pair of the five weak-supervision
    labeling functions — the inter-annotator-agreement audit a
    Snorkel-style pipeline runs before trusting a label model: po is raw
    agreement, pe the agreement two independent labelers with these
    marginals would produce by chance, kappa the chance-corrected score
    (NULL when pe = 1 leaves it undefined).  Reuses weak_label_votes'
    exact vote construction (and its oracle reuses that query's CTE
    chain verbatim), melted to (doc, lf, vote) rows: agreement is a
    doc-keyed self-join with constant L² = 25 fan-out per document,
    marginals one keyed count, chance agreement a join of two ≤ 3L-row
    aggregate frames, and n a 1-row broadcast scalar — every
    corpus-sized shuffle is keyed on doc_id."""
    from depositaja_spark.functions.cache import tracked_persist

    votes = q_weak_label_votes(spark, sf_dir).select("doc_id", *_KAPPA_LFS)
    stack_args = ", ".join(f"'{lf}', {lf}" for lf in _KAPPA_LFS)
    m = tracked_persist(
        votes.select(
            "doc_id",
            F.expr(f"stack({len(_KAPPA_LFS)}, {stack_args}) AS (lf, vote)"),
        ).select("doc_id", "lf", "vote")
    )
    n = votes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    marg = m.groupBy("lf", "vote").agg(F.count(F.lit(1)).cast("double").alias("c"))
    a = m.select("doc_id", F.col("lf").alias("lf_a"), F.col("vote").alias("va"))
    b = m.select("doc_id", F.col("lf").alias("lf_b"), F.col("vote").alias("vb"))
    agree = (
        a.join(b, "doc_id")
        .filter(F.col("lf_a") < F.col("lf_b"))
        .groupBy("lf_a", "lf_b")
        .agg(
            F.sum(F.when(F.col("va") == F.col("vb"), 1).otherwise(0))
            .cast("double")
            .alias("agr")
        )
    )
    ma = marg.select(F.col("lf").alias("lf_a"), "vote", F.col("c").alias("ca"))
    mb = marg.select(F.col("lf").alias("lf_b"), "vote", F.col("c").alias("cb"))
    chance = (
        ma.join(mb, "vote")
        .filter(F.col("lf_a") < F.col("lf_b"))
        .groupBy("lf_a", "lf_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("pp"))
    )
    joined = (
        agree.join(chance, ["lf_a", "lf_b"], "left_outer")
        .join(F.broadcast(n))
        .select(
            "lf_a",
            "lf_b",
            "agr",
            F.coalesce(F.col("pp"), F.lit(0.0)).alias("pp"),
            "n",
        )
    )
    po = F.col("agr") / F.col("n")
    pe = F.col("pp") / (F.col("n") * F.col("n"))
    return joined.select(
        "lf_a",
        "lf_b",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.when(F.col("pp") >= F.col("n") * F.col("n"), F.lit(None).cast("double"))
        .otherwise(F.round((po - pe) / (1 - pe), 6))
        .alias("kappa"),
    )


# --- Fleiss' kappa: all five LFs as one rater panel ---------------------------


def _fleiss_sql() -> str:
    # same vote CTE chain as the pairwise kappa (and weak_label_votes)
    prefix = _WEAK_SQL[: _WEAK_SQL.index("\nSELECT doc_id, v_len")]
    melt = "\nUNION ALL ".join(
        f"SELECT doc_id, {lf} AS vote FROM votes" for lf in _KAPPA_LFS
    )
    m = len(_KAPPA_LFS)
    return f"""{prefix},
m AS ({melt}),
nij AS (SELECT doc_id, vote, CAST(count(*) AS BIGINT) AS c
        FROM m GROUP BY 1, 2),
s AS (SELECT CAST(sum(c * c) AS BIGINT) AS s2 FROM nij),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM votes),
cj AS (SELECT vote, CAST(sum(c) AS BIGINT) AS cj FROM nij GROUP BY 1),
c2 AS (SELECT CAST(sum(cj * cj) AS DECIMAL(38,0)) AS c2 FROM cj)
SELECT nn.n AS n_items,
       CAST({m} AS INT) AS n_raters,
       round((CAST(s.s2 AS DOUBLE) - nn.n * {m})
             / (nn.n * {m} * {m - 1}), 6) AS p_bar,
       round(CAST(c2.c2 AS DOUBLE) / (CAST(nn.n * {m} AS DOUBLE)
                                      * (nn.n * {m})), 6) AS p_e,
       round(((CAST(s.s2 AS DOUBLE) - nn.n * {m})
              / (nn.n * {m} * {m - 1})
              - CAST(c2.c2 AS DOUBLE) / (CAST(nn.n * {m} AS DOUBLE)
                                         * (nn.n * {m})))
             / (1 - CAST(c2.c2 AS DOUBLE) / (CAST(nn.n * {m} AS DOUBLE)
                                             * (nn.n * {m}))), 6)
         AS fleiss_kappa
FROM s CROSS JOIN nn CROSS JOIN c2
"""


@query("fleiss_kappa_panel", _fleiss_sql())
def q_fleiss_kappa_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over the full five-labeler panel — the multi-rater
    generalization of the pairwise Cohen's kappa grid
    (labeler_agreement_kappa): one chance-corrected agreement score for
    the whole weak-supervision panel instead of C(5,2) pairwise cells.
    Every moment is an EXACT integer before the final float ops:
    Σ n_ij² (one (doc, vote)-keyed count then a global sum), category
    totals c_j (≤|votes| rows), N·m literals — so P̄ = (Σn_ij² − Nm) /
    (Nm(m−1)) and P_e = Σc_j²/(Nm)² are bit-identical across engines
    and partitionings.  Scale shape: the only corpus-sized shuffle is
    the (doc_id, vote) count; everything after runs on 1-row / ≤|vote|
    frames (1-row broadcast cross joins)."""
    from depositaja_spark.functions.cache import tracked_persist

    m_raters = len(_KAPPA_LFS)
    votes = q_weak_label_votes(spark, sf_dir).select("doc_id", *_KAPPA_LFS)
    stack_args = ", ".join(f"'{lf}', {lf}" for lf in _KAPPA_LFS)
    melted = tracked_persist(
        votes.select(
            "doc_id",
            F.expr(f"stack({m_raters}, {stack_args}) AS (lf, vote)"),
        ).select("doc_id", "vote")
    )
    nij = melted.groupBy("doc_id", "vote").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    s = nij.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"))
    nn = votes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    c2 = (
        nij.groupBy("vote")
        .agg(F.sum("c").cast("long").alias("cj"))
        .agg(
            F.sum(F.col("cj").cast("decimal(38,0)") * F.col("cj"))
            .cast("decimal(38,0)")
            .alias("c2")
        )
    )
    j = s.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(c2))
    nm = F.col("n") * m_raters
    p_bar = (F.col("s2").cast("double") - nm) / (nm * (m_raters - 1))
    p_e = F.col("c2").cast("double") / (nm.cast("double") * nm)
    return j.select(
        F.col("n").alias("n_items"),
        F.lit(m_raters).cast("int").alias("n_raters"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round((p_bar - p_e) / (1 - p_e), 6).alias("fleiss_kappa"),
    )


# --- leave-one-source-out impact (data valuation lite) -----------------------------
#
# Which source is dragging the corpus statistic?  For each source, the
# corpus-mean length WITHOUT it minus the overall mean — the
# closed-form leave-one-group-out influence used to triage mixture
# weights before any model-based valuation.  Exact integer sums, one
# keyed agg + a 1-row broadcast total; the delta arithmetic runs on the
# |sources|-bounded frame.

_LOO_SQL = """
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
g AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
             CAST(sum(chars) AS BIGINT) AS c_all FROM s)
SELECT source, n_docs,
       round(CAST(chars AS DOUBLE) / n_docs, 4) AS mean_chars,
       round(CAST(c_all - chars AS DOUBLE) / (n_all - n_docs)
             - CAST(c_all AS DOUBLE) / n_all, 6) AS loo_delta_chars
FROM s CROSS JOIN g
WHERE n_all > n_docs
"""


@query("source_loo_impact", _LOO_SQL)
def q_source_loo_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out influence on the corpus mean document
    length: positive delta = removing the source RAISES the mean (the
    source drags it down).  The group-level influence-function triage
    that precedes model-based data valuation."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars")
    )
    g = s.agg(
        F.sum("n_docs").alias("n_all"), F.sum("chars").alias("c_all")
    )
    loo = (F.col("c_all") - F.col("chars")).cast("double") / (
        F.col("n_all") - F.col("n_docs")
    ) - F.col("c_all").cast("double") / F.col("n_all")
    return (
        s.crossJoin(F.broadcast(g))
        .where(F.col("n_all") > F.col("n_docs"))
        .select(
            "source",
            "n_docs",
            F.round(F.col("chars").cast("double") / F.col("n_docs"), 4).alias(
                "mean_chars"
            ),
            F.round(loo, 6).alias("loo_delta_chars"),
        )
    )
