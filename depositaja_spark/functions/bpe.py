"""Distributed BPE tokenizer training (Sennrich, Haddow, Birch: "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016).

The classic byte-pair-encoding trainer, Spark-shaped:

  1. ONE corpus pass aggregates the word vocabulary with counts — the
     corpus is never touched again; every merge round works on the
     (much smaller) vocab table, exactly how production BPE trainers
     scale (the corpus is 100 TB, the distinct-word table is not);
  2. per round: explode adjacent symbol pairs weighted by word count,
     aggregate pair frequencies (map-side combined), take the global
     top-1 (a k=1 driver collect, like k-means centroids), and apply
     the merge to every vocab word with a single-pass array fold —
     no Python in any per-row path;
  3. repeat for ``num_merges`` rounds; lineage is truncated per round
     with localCheckpoint (same discipline as functions/graph.py — the
     merge fold references the previous round's frame, so the plan
     would otherwise grow round over round).

Determinism: ties in pair frequency break on (left, right) lexicographic
order, so the merge table is reproducible across partitionings/engines.

The word-end marker ``</w>`` is appended as its own symbol, standard BPE:
merges can then learn suffixes ("est</w>") distinct from mid-word pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.text import tokens

END = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) — the one corpus-sized aggregation."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _init_symbols(vocab: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the end marker."""
    return vocab.select(
        "word",
        "wcount",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))).alias("syms"),
    )


def _merge_adjacent(syms, left: str, right: str):
    """Single-pass fold that replaces every non-overlapping adjacent
    (left, right) with left||right — the BPE merge, as a Catalyst
    aggregate with a (out, pending) accumulator and a finish step, so it
    runs inside codegen with no UDF."""
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, x):
        pend = acc["pend"]
        hit = pend.eqNullSafe(F.lit(left)) & (x == F.lit(right))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(left + right))))
            .when(pend.isNull(), acc["out"])
            .otherwise(F.concat(acc["out"], F.array(pend)))
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(x).alias("pend"),
        )

    def finish(acc):
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(syms, acc0, step, finish)


def bpe_train(
    docs: DataFrame, num_merges: int = 8, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges; returns [(left, right, freq), ...]
    in merge order.  Each round is one vocab-sized aggregation + a k=1
    collect; the corpus itself is read exactly once."""
    vocab = _init_symbols(word_vocab(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        pairs = (
            vocab.select(
                "wcount",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wcount").alias("freq"))
        )
        top = pairs.orderBy(F.desc("freq"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top:
            break
        left, right, freq = top[0].l, top[0].r, int(top[0].freq)
        merges.append((left, right, freq))
        vocab = vocab.select(
            "word", "wcount", _merge_adjacent(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges


def bpe_segment_oracle_sql(
    merges: list[tuple[str, str, int]], docs_sql: str = "documents"
) -> str:
    r"""DuckDB twin of :func:`bpe_apply` under a PINNED merge list.

    The equivalence that makes segmentation SQL-expressible without
    recursion: encode each word's symbol sequence as a ``||``-delimited
    string (``||c1||c2||...||</w>||``); then ONE merge pass of the
    ``_merge_adjacent`` fold — a left-to-right non-overlapping
    replacement of adjacent (l, r) — is exactly ONE plain-substring
    ``replace(s, '|l||r|', '|lr|')``:

    * the pattern anchors on the INNER halves of the two-char token
      boundaries (``|l||r|``, not ``||l||r||``), so consecutive matches
      share no characters and ``replace``'s scan-continues-after-match
      behavior reproduces the fold's leftmost non-overlapping pairing
      (e.g. five ``a``'s under merge (a,a) → ``[aa, aa, a]``, not
      ``[aa, a, aa]``);
    * the replacement token ``lr`` can never itself match as the left
      or right of the SAME pattern (that would need r or l empty), so
      one pass is a fixpoint — exactly the fold's single pass;
    * symbols never contain ``|`` (whitespace tokens over the
      lowercase corpus + the ``</w>`` marker), so ``|l||r|`` can only
      match a whole adjacent token pair, never a token infix; and a
      merge's LEFT never contains ``</w>`` (it always has a right
      neighbor in-word), so word-final tokens never match as left —
      the whole document can be encoded as one concatenated string
      with no cross-word merges.

    k pinned merges in order = k nested replaces.  Preconditions
    (guaranteed by the fixture, asserted in tests/test_bpe.py): words
    are non-empty and delimiter-free.
    """
    expr = "s"
    for left, right, _ in merges:
        # the no-cross-word-match argument above needs left to be
        # in-word (trainable merges always are); fail loudly on a
        # hand-built list that violates it rather than diverge
        assert END not in left, f"merge left {left!r} contains {END}"
        assert "|" not in left + right, f"merge {left!r},{right!r} contains |"
        l_ = left.replace("'", "''")
        r_ = right.replace("'", "''")
        expr = f"replace({expr}, '|{l_}||{r_}|', '|{l_}{r_}|')"
    return rf"""
WITH enc AS (
  SELECT doc_id,
         '||' || regexp_replace(word, '(.)', '\1||', 'g') || '{END}||' AS ew
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM {docs_sql})
),
agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_tokens, string_agg(ew, '') AS s
  FROM enc GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST(len(list_filter(string_split_regex({expr}, '\|+'),
                            x -> x <> '')) AS INT) AS n_subwords
FROM agg
"""


def bpe_train_oracle_sql(num_merges: int, docs_sql: str = "documents") -> str:
    r"""DuckDB twin of :func:`bpe_train` — the TRAINING loop itself as
    chained CTEs, making ``bpe_merges`` fully oracle-backed.

    Each merge round is two bounded steps over the VOCAB (never the
    corpus): (1) pair frequencies from the boundary-encoded symbol
    strings (adjacent-token extraction via ``unnest(range(...))``),
    top-1 with the trainer's exact (freq desc, l asc, r asc) tie-break;
    (2) the merge applied with the same single-``replace`` equivalence
    :func:`bpe_segment_oracle_sql` proves — here with the pattern built
    DYNAMICALLY from the round's argmax row.  ``AS MATERIALIZED`` is
    load-bearing: each vocab state feeds both the next pair count and
    the next vocab state, and inlined CTEs would re-evaluate the chain
    2^k times.

    The degenerate early-break (no pairs left) keeps row-count parity
    via LEFT JOIN ON TRUE — an empty argmax leaves the vocab unchanged
    and contributes no output row, exactly like the trainer's break."""
    ctes, final = _bpe_train_oracle_parts(num_merges, docs_sql)
    return "WITH " + ctes + "\n" + final


def _bpe_train_oracle_parts(
    num_merges: int, docs_sql: str = "documents"
) -> tuple[str, str]:
    """(cte_section, final_select) for the trainer chain — structured
    so :func:`bpe_apply_trained_oracle_sql` can splice the CTEs without
    string-searching the assembled SQL (which broke for num_merges=0
    and was brittle to formatting changes)."""
    parts = [
        f"""v0 AS MATERIALIZED (
  SELECT word, count(*) AS wcount,
         '||' || regexp_replace(word, '(.)', '\\1||', 'g') || '{END}||' AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM {docs_sql})
  WHERE word <> '' GROUP BY word)"""
    ]
    for k in range(1, num_merges + 1):
        parts.append(
            f"""p{k} AS MATERIALIZED (
  SELECT toks[i] AS l, toks[i+1] AS r, CAST(sum(wcount) AS BIGINT) AS freq
  FROM (SELECT wcount, toks, unnest(range(1, len(toks))) AS i
        FROM (SELECT wcount,
                     list_filter(string_split_regex(s, '\\|+'), x -> x <> '') AS toks
              FROM v{k - 1}))
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"""t{k} AS MATERIALIZED (
  SELECT l, r, freq FROM p{k} ORDER BY freq DESC, l ASC, r ASC LIMIT 1)"""
        )
        parts.append(
            f"""v{k} AS MATERIALIZED (
  SELECT word, wcount,
         CASE WHEN t.l IS NULL THEN s
              ELSE replace(s, '|' || t.l || '||' || t.r || '|',
                           '|' || t.l || t.r || '|') END AS s
  FROM v{k - 1} LEFT JOIN t{k} t ON TRUE)"""
        )
    finals = "\nUNION ALL\n".join(
        f'SELECT CAST({k - 1} AS INT) AS step, l AS "left", r AS "right", freq'
        f" FROM t{k}"
        for k in range(1, num_merges + 1)
    ) or (
        # num_merges=0: zero training rounds emit zero merge rows
        'SELECT CAST(0 AS INT) AS step, \'\' AS "left", \'\' AS "right", '
        "CAST(0 AS BIGINT) AS freq WHERE FALSE"
    )
    return ",\n".join(parts), finals


def bpe_apply_trained_oracle_sql(
    num_merges: int, docs_sql: str = "documents"
) -> str:
    r"""DuckDB twin of ``bpe_apply(docs, bpe_train(docs, k))`` — the
    whole train-then-segment pipeline, making ``bpe_subword_counts``
    oracle-backed: the trainer chain of :func:`bpe_train_oracle_sql`
    discovers each round's merge, and a parallel document chain applies
    it to the concatenated per-doc encoding (cross-word matches are
    impossible: a trainable merge's LEFT always has a right neighbor
    in-word, so it never contains ``</w>`` — the same invariant
    :func:`bpe_segment_oracle_sql` asserts for pinned lists)."""
    cte_section, _ = _bpe_train_oracle_parts(num_merges, docs_sql)
    cte_section = "WITH " + cte_section
    parts = [
        f"""d0 AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS INT) AS n_tokens, string_agg(ew, '') AS s
  FROM (SELECT doc_id,
               '||' || regexp_replace(word, '(.)', '\\1||', 'g') || '{END}||' AS ew
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM {docs_sql}))
  GROUP BY doc_id)"""
    ]
    for k in range(1, num_merges + 1):
        parts.append(
            f"""d{k} AS MATERIALIZED (
  SELECT doc_id, n_tokens,
         CASE WHEN t.l IS NULL THEN s
              ELSE replace(s, '|' || t.l || '||' || t.r || '|',
                           '|' || t.l || t.r || '|') END AS s
  FROM d{k - 1} LEFT JOIN t{k} t ON TRUE)"""
        )
    return (
        cte_section
        + ",\n"
        + ",\n".join(parts)
        + f"""
SELECT doc_id, n_tokens,
       CAST(len(list_filter(string_split_regex(s, '\\|+'),
                            x -> x <> '')) AS INT) AS n_subwords
FROM d{num_merges}
"""
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, n_subwords) — tokenize with the learned merges.

    Round-12 plan: the merge fold runs over the DISTINCT-WORD VOCAB,
    not over every token occurrence (the trainer's own trick, applied
    to segmentation): segmentation is per-word — no merge crosses a
    word boundary (its left never contains ``</w>``, the invariant
    :func:`bpe_segment_oracle_sql` proves) — so
    ``n_subwords(doc) = Σ_word count(doc, word) · |segment(word)|``.
    The k-merge codegen'd fold therefore touches |vocab| rows instead
    of |corpus tokens| rows; the per-doc counts come back via one
    word-keyed equi-join.  The sf10 ledger measured the per-occurrence
    plan at 407 s (×11.7/decade, amplified by the replica token salt
    growing words one char per suffix decade — SCALING.md r12); the
    vocab is ~20× smaller than the occurrence multiset at that scale
    and shrinks the fold proportionally.  Output is value-identical to
    the per-occurrence plan (same ``tokens``, same fold per word), so
    the registered oracle is unchanged."""
    from depositaja_spark.functions.cache import tracked_persist

    d = docs.select(F.col(id_col), tokens(text_col).alias("toks"))
    # (r13) persist the (doc, word) counts: both downstream arms — the
    # vocab for the merge fold and the count join — consume this frame,
    # and without the persist Catalyst re-derives the vocab from a SECOND
    # full scan + tokenize + explode of the corpus (2 scans → 1 in the
    # plan).  Shuffle-sized state (distinct (doc, word) pairs), the same
    # bytes the word-keyed join moves anyway; released by the caller's
    # release_caches() like every operator-internal cache.
    occ = tracked_persist(
        d.select(id_col, F.explode("toks").alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = occ.select("word").distinct()
    syms = F.concat(F.split(F.col("word"), ""), F.array(F.lit(END)))
    seg = vocab.select("word", syms.alias("s"))
    for left, right, _ in merges:
        seg = seg.select("word", _merge_adjacent(F.col("s"), left, right).alias("s"))
    seg = seg.select("word", F.size("s").alias("n_sub"))
    return (
        occ.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("int").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("n_sub")).cast("int").alias("n_subwords"),
        )
    )
