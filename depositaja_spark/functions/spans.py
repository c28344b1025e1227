"""Exact substring-level deduplication: duplicated n-gram SPAN detection
and span clipping.

Document-level dedup (exact / MinHash / SimHash — functions/dedup.py)
drops whole documents, but real web corpora mostly repeat PIECES of
documents: boilerplate headers, license blocks, quoted paragraphs,
syndicated passages.  The standard remedy (Lee et al., "Deduplicating
Training Data Makes Language Models Better", 2022) finds every token
n-gram that occurs in more than one document and removes the covered
token RANGES, keeping the rest of the document.  This module is that
operator, Spark-first:

1. positional n-grams — one ``transform(sequence(...))`` per document
   builds (pos, gram-hash) pairs array-side, then ONE explode; no
   self-join, no per-row Python, the whole gram build stays inside a
   single codegen stage exactly like ``dedup.shingles``.
2. duplicated grams — gram-hash groupBy keeping hashes seen in ≥ 2
   distinct documents (cross-document duplication only: a phrase
   repeated inside one document is that document's own business).
   ``approx`` note: the group key is the 60-bit portable hash, so two
   different grams collide with p ≈ 2⁻⁶⁰ — the same accepted collision
   budget as the MinHash verify arm.
3. span merge — duplicated positions cover intervals [pos, pos+n); the
   gaps-and-islands window (partitioned by the high-cardinality doc_id,
   ordered by pos) merges overlapping-or-adjacent intervals in one pass
   with no self-join, mirroring queries_window.user_activity_streaks.

Scale notes (100 TB): the gram frame is ~tokens-per-doc rows per doc —
the same order as the shingle frame the MinHash path already shuffles;
the duplicated-gram set shuffles on the gram hash (uniform by
construction, no skew); the positions→dup-grams restriction is a
semi-join on the hash.  Boilerplate grams (df in the millions) fan back
out only to their true occurrences, which is exactly the text the
operator exists to remove.  Hashing cost is O(total_tokens × n) md5
bytes; a production deployment swaps ``hash64`` for a Rabin-Karp
rolling hash (O(total_tokens)) at the price of losing the DuckDB-
portable oracle — the plan shape is identical.

Reference scope note: the reference engine (dinorain/depositaja) has no
corpus operators; this family extends the engine along SURVEY.md §2's
LLM-data-pipeline axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: span n-gram width in TOKENS.  Lee et al. use 50 BPE tokens against
#: web-crawl documents; the synthetic fixture's documents are 10–99
#: whitespace tokens (median 56), so the same "meaningful fraction of a
#: document" ratio lands at 8.
SPAN_NGRAM = 8

_H64_SQL = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"


def _gram_entries(n: int) -> Column:
    """Array of (pos, gh) structs for every n-token gram of ``toks``.

    Generated-SQL expression (one F.expr, not ~6 Column ops per term):
    query BUILD time is driver py4j latency, re-paid per invocation —
    see the dedup.simhash note.  ``pos`` is the 0-based token index of
    the gram's first token; ``slice`` is 1-based, hence pos+1."""
    gram = f"array_join(slice(toks, i + 1, {n}), ' ')"
    return F.expr(
        f"transform(sequence(0, size(toks) - {n}), i -> "
        f"struct(i AS pos, {_H64_SQL.format(x=gram)} AS gh))"
    )


def positional_gram_hashes(
    docs: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, gh): 60-bit hash of the n-token gram starting at
    0-based token position ``pos``.  Documents shorter than n tokens
    contribute nothing (Spark's ``sequence(0, negative)`` would count
    DOWN, so the length guard is correctness, not just economy)."""
    toks = F.split(F.col(text_col), " ")
    return (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= n)
        .select("doc_id", F.explode(_gram_entries(n)).alias("e"))
        .select("doc_id", F.col("e.pos").alias("pos"), F.col("e.gh").alias("gh"))
    )


def duplicated_positions(
    docs: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos) of every gram occurring in ≥ 2 distinct documents.

    The dup-gram set is an aggregation keyed by the gram hash (map-side
    partials collapse per-partition repeats before the one shuffle); the
    restriction back onto positions is a semi-join on that key.  The
    gram frame feeds BOTH sides, so it is persisted — Catalyst would
    otherwise tokenize and md5-hash the corpus once per branch."""
    from depositaja_spark.functions.cache import tracked_persist

    grams = tracked_persist(positional_gram_hashes(docs, n, text_col))
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gh")
    )
    return grams.join(dup, "gh", "left_semi").select("doc_id", "pos")


def _merge_spans(pos: DataFrame, n: int) -> DataFrame:
    """(doc_id, span_start, span_end) from a (doc_id, pos) start-position
    frame: gaps-and-islands merge of the fixed-length intervals
    [pos, pos+n).

    A new island starts when the gap to the previous start exceeds n
    (fixed interval length makes the running-max-of-end reduce to the
    previous start + n).  One window over doc_id — high-cardinality
    partition key, audit-safe — then one aggregation; no interval
    self-join."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(w)
    island_flag = F.when(prev.isNull() | (F.col("pos") - prev > n), 1).otherwise(0)
    islands = pos.withColumn(
        "island",
        F.sum(island_flag).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + n).cast("int").alias("span_end"),
        )
        .drop("island")
    )


def duplicate_spans(
    docs: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, span_start, span_end): maximal merged token ranges
    [span_start, span_end) covered by cross-document duplicated
    n-grams."""
    return _merge_spans(duplicated_positions(docs, n, text_col), n)


def self_repetition_spans(
    docs: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, span_start, span_end): token ranges covered by n-grams
    REPEATED WITHIN the same document, keeping each gram's first
    occurrence (only repeats are flagged).  The intra-document
    counterpart of ``duplicate_spans`` — the filter that catches looped
    generations, copy-pasted paragraphs, and template stutter inside a
    single document.

    The repeat criterion is a min-over-(doc, gram) window — both keys in
    the partition key, so the per-partition group count scales with the
    corpus and no global sort exists; positions equal to their gram's
    first occurrence are dropped before the islands merge."""
    grams = positional_gram_hashes(docs, n, text_col)
    w = Window.partitionBy("doc_id", "gh")
    rep = (
        grams.withColumn("first_pos", F.min("pos").over(w))
        .filter(F.col("pos") > F.col("first_pos"))
        .select("doc_id", "pos")
    )
    return _merge_spans(rep, n)


def clip_duplicate_spans(
    docs: DataFrame, n: int = SPAN_NGRAM, text_col: str = "text"
) -> DataFrame:
    """(doc_id, clean_text, n_kept): each document with every duplicated
    span's tokens removed; documents whose every token is covered drop
    out entirely (nothing left to keep — the whole-document-duplicate
    case, which document-level dedup also removes).

    Kept positions are found by an ANTI-join of token positions against
    covered positions — covered positions come straight from the
    duplicated gram starts (``explode(sequence(pos, pos+n-1))``,
    deduplicated per document array-side by the distinct), so no
    interval range-join is ever materialized.  Reassembly is the
    sort-array-of-structs idiom: collect_list is unordered by contract,
    the array_sort on (pos, tok) structs restores token order without a
    window."""
    covered = (
        duplicated_positions(docs, n, text_col)
        .select("doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos"))
        .distinct()
    )
    toks = (
        docs.select("doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"))
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    return kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )


#: multi-scale widths: n · 2^k for k in range(SPAN_LEVELS) — 8/16/32
#: token spans at the default SPAN_NGRAM
SPAN_LEVELS = 3


def multiscale_duplicate_spans(
    docs: DataFrame,
    n: int = SPAN_NGRAM,
    levels: int = SPAN_LEVELS,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, width, span_start, span_end): duplicated-span detection
    at DOUBLING gram widths n, 2n, 4n, … over ONE positional-gram
    index.  Short boilerplate shows up at width n; a width-4n span is a
    much stronger signal (a 4n-token verbatim cross-document match) and
    long syndicated passages merge at the coarse scales without ever
    re-hashing the text at those widths.

    The scale trick is PREFIX DOUBLING (the suffix-array construction
    idea): level-0 hashes are the usual n-token gram md5s; level k+1's
    hash at position i is H(g_k at i, g_k at i + step) with
    step = n·2^k — ONE keyed equi-join of the persisted level-k frame
    with itself on (doc_id, pos + step), partitioned by doc_id.  Total
    hashing cost is O(total_tokens · n) md5 bytes for level 0 plus
    O(total_tokens) per extra level (two 20-digit strings per gram),
    instead of O(total_tokens · width) per width — the "same index,
    wider spans without quadratic cost" property.  (An array-side zip
    of per-document hash arrays would avoid the join but collapses into
    one projection whose level-k expression inlines level k−1 TWICE —
    exponential codegen blowup; the keyed join keeps every level
    computed exactly once.)  Everything after hashing is the proven
    single-scale shape, keyed by (width, gh): one aggregation for the
    dup set, one semi-join back, one gaps-and-islands window per
    (doc_id, width).

    Levels inherit level 0's p ≈ 2⁻⁶⁰ collision budget (each doubling
    hashes the decimal concatenation of two 60-bit values)."""
    from functools import reduce

    from depositaja_spark.functions.cache import tracked_persist

    comb = _H64_SQL.format(x="concat(cast(ha AS STRING), ':', cast(hb AS STRING))")
    level = tracked_persist(positional_gram_hashes(docs, n, text_col))
    pieces = [
        level.select(
            "doc_id", F.lit(n).cast("int").alias("width"), "pos", "gh"
        )
    ]
    for k in range(1, levels):
        step = n * (2 ** (k - 1))
        joined = (
            level.alias("a")
            .join(
                level.alias("b"),
                (F.col("a.doc_id") == F.col("b.doc_id"))
                & (F.col("b.pos") == F.col("a.pos") + step),
            )
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("a.pos").alias("pos"),
                F.col("a.gh").alias("ha"),
                F.col("b.gh").alias("hb"),
            )
        )
        level = tracked_persist(
            joined.select("doc_id", "pos", F.expr(comb).alias("gh"))
        )
        pieces.append(
            level.select(
                "doc_id",
                F.lit(n * (2 ** k)).cast("int").alias("width"),
                "pos",
                "gh",
            )
        )
    grams = tracked_persist(reduce(DataFrame.unionByName, pieces))
    dup = (
        grams.groupBy("width", "gh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("width", "gh")
    )
    pos = grams.join(dup, ["width", "gh"], "left_semi").select(
        "doc_id", "width", "pos"
    )
    w = Window.partitionBy("doc_id", "width").orderBy("pos")
    prevp = F.lag("pos").over(w)
    flag = F.when(prevp.isNull() | (F.col("pos") - prevp > F.col("width")), 1).otherwise(0)
    islands = pos.withColumn(
        "island",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        islands.groupBy("doc_id", "width", "island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + F.col("width")).cast("int").alias("span_end"),
        )
        .drop("island")
    )
