"""Distributed BPE trainer: golden parity with an independent in-memory
reference implementation, merge-application invariants."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions import bpe


def _ref_bpe(word_counts: dict[str, int], num_merges: int):
    """Independent reference: the textbook in-memory BPE trainer."""
    vocab = {tuple(list(w) + [bpe.END]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(num_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # same tie-break as the Spark trainer: freq desc, then lexicographic
        (left, right), freq = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, freq))
        new_vocab = {}
        for syms, c in vocab.items():
            out, pend = [], None
            for x in syms:
                if pend == left and x == right:
                    out.append(left + right)
                    pend = None
                elif pend is None:
                    pend = x
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


WORDS = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(0, " ".join(WORDS))], "doc_id long, text string"
    )


def test_golden_merges_match_reference(spark, corpus):
    got = bpe.bpe_train(corpus, num_merges=6)
    want = _ref_bpe(collections.Counter(WORDS), 6)
    assert got == want


def test_apply_identity_and_monotone(spark, corpus):
    merges = bpe.bpe_train(corpus, num_merges=6)
    zero = bpe.bpe_apply(corpus, []).collect()[0]
    # zero merges: every word contributes len(word)+1 symbols
    assert zero.n_subwords == sum(len(w) + 1 for w in WORDS)
    counts = [
        bpe.bpe_apply(corpus, merges[:k]).collect()[0].n_subwords
        for k in (0, 2, 4, 6)
    ]
    assert counts == sorted(counts, reverse=True), counts
    assert counts[-1] < counts[0]


def test_vocab_is_weighted(spark, corpus):
    v = {r.word: r.wcount for r in bpe.word_vocab(corpus).collect()}
    assert v == dict(collections.Counter(WORDS))


# --- pinned-merge segmentation replay oracle --------------------------------


def _ref_segment(text: str, merges) -> tuple[int, int]:
    """Third implementation of segmentation (independent of both the
    Spark fold and the DuckDB replay): per-word single-pass merge
    application, returns (n_tokens, n_subwords)."""
    words = text.split(" ")
    total = 0
    for w in words:
        syms = list(w) + [bpe.END]
        for left, right, *_ in merges:
            out, pend = [], None
            for x in syms:
                if pend == left and x == right:
                    out.append(left + right)
                    pend = None
                elif pend is None:
                    pend = x
                else:
                    out.append(pend)
                    pend = x
            if pend is not None:
                out.append(pend)
            syms = out
        total += len(syms)
    return len(words), total


# adversarial docs: repeated-run pairing (the leftmost-greedy case the
# shared-delimiter encoding gets wrong), overlapping alternations,
# merged-token-as-left chains, end-marker merges, cross-word adjacency
_ADV_DOCS = [
    "aaaaa aaa aaaa a aa",
    "ababab abab ab ba",
    "low lower lowest newest widest",
    "xe ex e ee xee eex",
    "zzz zz z zzzz zzzzz zzzzzz",
]
_ADV_MERGES = [
    ("a", "a", 0), ("aa", "a", 0), ("aa", "aa", 0),
    ("a", "b", 0), ("ab", "ab", 0),
    ("e", bpe.END, 0), ("x", "e" + bpe.END, 0),
    ("z", "z", 0), ("zz", "zz", 0),
    ("l", "o", 0), ("lo", "w", 0), ("low", bpe.END, 0),
]


def test_segment_replay_three_way_adversarial(spark):
    """Spark fold == DuckDB replace-replay == independent Python fold
    on adversarial inputs (repeated runs, overlap chains, END merges)."""
    import duckdb

    docs = spark.createDataFrame(
        list(enumerate(_ADV_DOCS)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_subwords)
        for r in bpe.bpe_apply(docs, _ADV_MERGES).collect()
    }
    want = {i: _ref_segment(t, _ADV_MERGES) for i, t in enumerate(_ADV_DOCS)}
    assert got == want
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(_ADV_DOCS))
        + ") AS t(doc_id, text)"
    )
    sql = bpe.bpe_segment_oracle_sql(_ADV_MERGES)
    orc = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert orc == want


def test_segment_oracle_rejects_crossword_left():
    """A merge whose LEFT contains the end marker would let the
    concatenated-document encoding match across word boundaries (the
    per-word Spark fold never can) — the builder must refuse it."""
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="contains"):
        bpe.bpe_segment_oracle_sql([("e" + bpe.END, "x", 0)])


def test_pinned_artifact_provenance_refit(spark):
    """BPE_MERGES re-derives exactly from the pinned sf0.01 fixture with
    the repo's own trainer (the pq_artifact re-fit discipline)."""
    from depositaja_spark.functions.bpe_artifact import BPE_MERGES

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert bpe.bpe_train(docs, num_merges=len(BPE_MERGES)) == BPE_MERGES


def test_fixture_satisfies_encoding_preconditions():
    """The oracle's encoding needs non-empty, delimiter-free whitespace
    tokens; assert it on the fixture the driver actually runs."""
    import duckdb

    n = duckdb.connect().execute(
        "SELECT count(*) FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
        " WHERE text = '' OR text LIKE '%  %' OR text LIKE ' %'"
        " OR text LIKE '% ' OR text LIKE '%|%' OR text LIKE '%<%'"
    ).fetchone()[0]
    assert n == 0


def test_trainer_oracle_three_way_adversarial(spark):
    """The TRAINING loop oracle (bpe_train_oracle_sql): Spark trainer ==
    in-memory reference == DuckDB chained-CTE replay, on an adversarial
    corpus (repeated runs, tie-heavy pair counts, END-merges)."""
    import duckdb

    docs = list(enumerate(_ADV_DOCS))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = bpe.bpe_train(sdf, num_merges=6)
    want = _ref_bpe(
        collections.Counter(t for _, d in docs for t in d.split(" ") if t), 6
    )
    assert got == want
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") AS t(doc_id, text)"
    )
    orc = con.execute(bpe.bpe_train_oracle_sql(6)).fetchall()
    assert [(l, r, f) for _, l, r, f in orc] == [(l, r, int(f)) for l, r, f in want]


def test_train_then_segment_oracle_matches_fold(spark):
    """bpe_apply_trained_oracle_sql — the full train-then-segment SQL —
    equals bpe_apply over bpe_train on the adversarial corpus."""
    import duckdb

    docs = list(enumerate(_ADV_DOCS))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe.bpe_train(sdf, num_merges=6)
    got = {
        r.doc_id: (r.n_tokens, r.n_subwords)
        for r in bpe.bpe_apply(sdf, merges).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in docs)
        + ") AS t(doc_id, text)"
    )
    orc = {
        r[0]: (r[1], r[2])
        for r in con.execute(bpe.bpe_apply_trained_oracle_sql(6)).fetchall()
    }
    assert orc == got
    # and the independent python fold agrees
    assert orc == {i: _ref_segment(t, merges) for i, t in docs}
