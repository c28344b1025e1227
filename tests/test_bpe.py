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
