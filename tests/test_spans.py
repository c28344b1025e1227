"""Substring-span dedup (functions/spans.py): goldens on hand-built
corpora, structural invariants, and a brute-force Python replica."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions import spans as sp


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_phrase_produces_one_span_per_doc(spark):
    """Two docs share a 10-token run; with n=8 the duplicated starts are
    positions 0..2 of the run, merging into ONE span covering exactly
    the shared tokens."""
    shared = _words("s", 10)
    docs = _docs(
        spark,
        [
            (1, shared + " " + _words("a", 20)),
            (2, _words("b", 5) + " " + shared + " " + _words("c", 9)),
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in sp.duplicate_spans(docs, n=8).collect()
    }
    assert got == {(1, 0, 10), (2, 5, 15)}


def test_disjoint_repeats_stay_separate_spans(spark):
    """Two shared phrases far apart in the same doc → two spans (the
    islands merge must not bridge a gap > n)."""
    p1, p2 = _words("x", 8), _words("y", 8)
    docs = _docs(
        spark,
        [
            (1, p1 + " " + _words("f", 20) + " " + p2),
            (2, p1 + " " + _words("g", 30) + " " + p2),
        ],
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in sp.duplicate_spans(docs, n=8).collect()
    )
    assert got == [(1, 0, 8), (1, 28, 36), (2, 0, 8), (2, 38, 46)]


def test_within_doc_repeat_is_not_a_span(spark):
    """A phrase repeated twice INSIDE one doc but present nowhere else
    must not be flagged (cross-document criterion)."""
    p = _words("r", 8)
    docs = _docs(
        spark,
        [(1, p + " " + _words("m", 10) + " " + p), (2, _words("z", 30))],
    )
    assert sp.duplicate_spans(docs, n=8).count() == 0


def test_clip_removes_exactly_covered_tokens(spark):
    shared = _words("s", 10)
    tail = _words("a", 20)
    docs = _docs(
        spark,
        [(1, shared + " " + tail), (2, shared)],
    )
    rows = {r.doc_id: r for r in sp.clip_duplicate_spans(docs, n=8).collect()}
    # doc 2 is wholly covered -> dropped; doc 1 keeps only its tail
    assert set(rows) == {1}
    assert rows[1].clean_text == tail
    assert rows[1].n_kept == 20


def test_short_docs_pass_through_untouched(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])  # < n tokens
    assert sp.duplicate_spans(docs, n=8).count() == 0
    rows = {r.doc_id: r for r in sp.clip_duplicate_spans(docs, n=8).collect()}
    assert rows[1].clean_text == "a b c" and rows[2].clean_text == "a b c"


def _python_spans(texts: dict[int, str], n: int) -> set[tuple[int, int, int]]:
    """Independent brute-force replica of the operator's contract."""
    grams: dict[str, set[int]] = {}
    pos_by_doc: dict[int, list[int]] = {}
    toks = {d: t.split(" ") for d, t in texts.items()}
    for d, tk in toks.items():
        for i in range(len(tk) - n + 1):
            grams.setdefault(" ".join(tk[i : i + n]), set()).add(d)
    for d, tk in toks.items():
        for i in range(len(tk) - n + 1):
            if len(grams[" ".join(tk[i : i + n])]) >= 2:
                pos_by_doc.setdefault(d, []).append(i)
    out = set()
    for d, ps in pos_by_doc.items():
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > n:
                out.add((d, start, prev + n))
                start = p
            prev = p
        out.add((d, start, prev + n))
    return out


@pytest.mark.parametrize("n", [3, 8])
def test_matches_bruteforce_on_fixture_slice(spark, n):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    want = _python_spans(texts, n)
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in sp.duplicate_spans(docs, n=n).collect()
    }
    assert got == want


def test_spans_are_disjoint_and_at_least_n(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    rows = sp.duplicate_spans(docs, n=8).collect()
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        assert r.span_end - r.span_start >= 8
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for ivs in by_doc.values():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert s2 > e1, "merged spans must be strictly disjoint"


def test_clip_token_accounting(spark):
    """kept + covered == total tokens, per doc."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    total = {
        r.doc_id: r.n for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    covered = {
        r.doc_id: r.c
        for r in sp.duplicate_spans(docs, n=8)
        .groupBy("doc_id")
        .agg(F.sum(F.col("span_end") - F.col("span_start")).alias("c"))
        .collect()
    }
    kept = {r.doc_id: r.n_kept for r in sp.clip_duplicate_spans(docs, n=8).collect()}
    for d, n_total in total.items():
        assert kept.get(d, 0) + covered.get(d, 0) == n_total


def test_self_repetition_flags_only_repeats(spark):
    """'x y z' repeated twice in one doc: the second occurrence is a
    span, the first is kept; a doc without repeats yields nothing."""
    from depositaja_spark.functions.spans import self_repetition_spans

    docs = _docs(
        spark,
        [
            (1, "x y z a b c x y z"),      # 3-gram 'x y z' at 0 and 6
            (2, "p q r s t u v w"),        # no repeats
        ],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in self_repetition_spans(docs, n=3).collect()
    }
    assert got == {(1, 6, 9)}


def test_self_repetition_adjacent_loop_merges(spark):
    """A looped phrase 'a b c a b c a b c' flags every occurrence after
    the first and merges them into one span."""
    from depositaja_spark.functions.spans import self_repetition_spans

    docs = _docs(spark, [(1, "a b c a b c a b c")])
    got = [
        (r.span_start, r.span_end)
        for r in self_repetition_spans(docs, n=3).collect()
    ]
    # repeated starts: 'a b c' first at 0 repeats at 3,6; 'b c a' first
    # at 1 repeats at 4; 'c a b' first at 2 repeats at 5 — positions
    # {3,4,5,6} merge into the single span [3, 9)
    assert got == [(3, 9)]


def test_self_repetition_matches_bruteforce(spark):
    from depositaja_spark.functions.spans import self_repetition_spans

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    n = 3
    want_pos: dict[int, list[int]] = {}
    for d, t in texts.items():
        tk = t.split(" ")
        first: dict[str, int] = {}
        ps = []
        for i in range(len(tk) - n + 1):
            g = " ".join(tk[i : i + n])
            if g in first:
                ps.append(i)
            else:
                first[g] = i
        if ps:
            want_pos[d] = ps
    want = set()
    for d, ps in want_pos.items():
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev > n:
                want.add((d, start, prev + n))
                start = p
            prev = p
        want.add((d, start, prev + n))
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in self_repetition_spans(docs, n=n).collect()
    }
    assert got == want


def test_clean_corpus_full_is_not_a_noop_splice(spark):
    """The composed pipeline must actually run the clip stage: on the
    fixture the clipped corpus loses whole documents and breaks some
    near-dup clusters, so the keeper set differs from plain
    clean_corpus."""
    from depositaja_spark import registry

    sf = "/root/testdata/sf0.01"
    plain = {r.doc_id for r in registry.QUERIES["clean_corpus"](spark, sf).collect()}
    full = {r.doc_id for r in registry.QUERIES["clean_corpus_full"](spark, sf).collect()}
    assert plain != full


def _multiscale_collect(spark_df):
    from depositaja_spark.functions.cache import release_caches

    rows = sp.multiscale_duplicate_spans(spark_df).collect()
    release_caches()
    out: dict[int, set] = {}
    for r in rows:
        out.setdefault(r.width, set()).add((r.doc_id, r.span_start, r.span_end))
    return out


def test_multiscale_matches_bruteforce_per_width(spark):
    """Prefix-doubling spans at widths n/2n/4n must equal a direct
    brute-force duplicated-token-window recomputation AT EACH WIDTH —
    the doubling construction is exact, not approximate: level-k hash
    equality ⟺ 2^k·n-token window equality (mod the 2⁻⁶⁰ collision
    budget)."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = _multiscale_collect(docs)
    n = sp.SPAN_NGRAM
    for k in range(sp.SPAN_LEVELS):
        w = n * (2 ** k)
        assert got.get(w, set()) == _python_spans(texts, w), f"width {w}"


def test_multiscale_long_boilerplate_surfaces_at_coarse_width(spark):
    """A 40-token passage shared verbatim by two docs must appear at
    ALL THREE widths (a 32-token window fits inside it), while an
    8-token shared phrase appears only at width 8."""
    passage = _words("p", 40)
    phrase = _words("q", 8)
    docs = _docs(
        spark,
        [
            (1, passage + " " + _words("a", 12)),
            (2, _words("b", 7) + " " + passage),
            (3, phrase + " " + _words("c", 30)),
            (4, _words("d", 11) + " " + phrase),
        ],
    )
    got = _multiscale_collect(docs)
    assert (1, 0, 40) in got[8] and (2, 7, 47) in got[8]
    assert (1, 0, 40) in got[16] and (2, 7, 47) in got[16]
    assert (1, 0, 40) in got[32] and (2, 7, 47) in got[32]
    assert (3, 0, 8) in got[8] and (4, 11, 19) in got[8]
    assert not any(d in (3, 4) for d, _, _ in got.get(16, set()))
    assert not any(d in (3, 4) for d, _, _ in got.get(32, set()))
    # every width's spans over this corpus also equal the brute replay
    texts = {r.doc_id: r.text for r in docs.collect()}
    for w in (8, 16, 32):
        assert got.get(w, set()) == _python_spans(texts, w), f"width {w}"
