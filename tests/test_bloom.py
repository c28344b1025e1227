"""Bloom-filter prefilter guarantees (functions/bloom.py): zero false
negatives, bounded false positives, bitmap compactness, OR-mergeability,
and end-to-end exactness of the prefilter→verify composition."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from depositaja_spark.functions.bloom import (
    BLOOM_K,
    bloom_build,
    bloom_maybe_contains,
    bloom_prefilter_members,
)

M = 1 << 14  # 16 Ki bits for ~500-key test sets → ~32 bits/key


@pytest.fixture(scope="module")
def keysets(spark):
    members = spark.range(0, 500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    probes = spark.range(0, 1000).select(  # 500 members + 500 strangers
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    return members, probes


def test_no_false_negatives(spark, keysets):
    members, probes = keysets
    bloom = bloom_build(members, "k", M)
    got = bloom_maybe_contains(probes, bloom, "k", M).collect()
    assert all(r.maybe_member for r in got if int(r.k.split("-")[1]) < 500)


def test_false_positive_rate_bounded(spark, keysets):
    members, probes = keysets
    bloom = bloom_build(members, "k", M)
    got = bloom_maybe_contains(probes, bloom, "k", M).collect()
    fps = sum(1 for r in got if r.maybe_member and int(r.k.split("-")[1]) >= 500)
    # 32 bits/key, k=7 → theoretical FP ~1e-4; allow generous slack
    assert fps <= 5, f"{fps} false positives out of 500 strangers"


def test_bitmap_is_compact_and_sparse_rows_only(spark, keysets):
    members, _ = keysets
    bloom = bloom_build(members, "k", M).collect()
    # at most one row per 64-bit word, only SET words materialize
    assert len(bloom) <= M // 64
    assert all(r.word != 0 for r in bloom)
    assert len({r.word_idx for r in bloom}) == len(bloom)


def test_merge_law_union_equals_bitor(spark):
    a = spark.range(0, 300).select(F.concat(F.lit("a-"), F.col("id")).alias("k"))
    b = spark.range(0, 300).select(F.concat(F.lit("b-"), F.col("id")).alias("k"))
    merged = (
        bloom_build(a, "k", M)
        .unionByName(bloom_build(b, "k", M))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    direct = bloom_build(a.unionByName(b), "k", M)
    got = {(r.word_idx, r.word) for r in merged.collect()}
    want = {(r.word_idx, r.word) for r in direct.collect()}
    assert got == want


def test_prefilter_members_is_exact(spark, keysets):
    members, probes = keysets
    got = {
        r.k: r.is_member
        for r in bloom_prefilter_members(members, probes, "k", m_bits=M).collect()
    }
    assert len(got) == 1000
    for k, is_member in got.items():
        assert is_member == (int(k.split("-")[1]) < 500)


def test_undersized_filter_still_exact(spark, keysets):
    """Sizing mistakes cost performance, never correctness: at 2 bits/key
    nearly everything is a maybe-member, but verify keeps the result
    exact."""
    members, probes = keysets
    got = {
        r.k: r.is_member
        for r in bloom_prefilter_members(members, probes, "k", m_bits=1 << 10).collect()
    }
    for k, is_member in got.items():
        assert is_member == (int(k.split("-")[1]) < 500)


def test_k_positions_distinct_for_pow2_m(spark):
    """The odd-h2 guard: positions of one key never collapse to a single
    bucket even with power-of-two m."""
    from depositaja_spark.functions.bloom import _positions

    df = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    n_distinct = df.select(
        F.size(F.array_distinct(_positions(F.col("k"), M, BLOOM_K))).alias("n")
    ).agg(F.min("n")).first()[0]
    assert n_distinct >= BLOOM_K - 1  # birthday collisions possible, collapse is not


def test_duplicate_probe_rows_preserve_cardinality(spark, keysets):
    """Duplicate probe rows must each get their own verdict row (the
    probe groups on a unique row tag, not the probe columns), and the
    per-row membership check must stay min(hit)==1 so a duplicated
    member can never become a FALSE NEGATIVE."""
    members, _ = keysets
    bloom = bloom_build(members, "k", M)
    dup_probes = spark.createDataFrame(
        [("key-7",), ("key-7",), ("key-7",), ("stranger-1",), ("stranger-1",)],
        "k string",
    )
    rows = bloom_maybe_contains(dup_probes, bloom, "k", M).collect()
    assert len(rows) == 5, "duplicate probe rows must not collapse"
    got = {}
    for r in rows:
        got.setdefault(r.k, []).append(r.maybe_member)
    assert got["key-7"] == [True, True, True]
    assert got["stranger-1"] == [False, False]


def test_map_typed_probe_columns_supported(spark, keysets):
    """Regression (r6 advice): grouping on all probe columns failed
    outright for non-groupable (map-typed) payloads.  The row-tag
    grouping must carry a map column through untouched."""
    members, _ = keysets
    bloom = bloom_build(members, "k", M)
    probes = spark.createDataFrame(
        [("key-3", {"a": 1}), ("stranger-9", {"b": 2})],
        "k string, payload map<string,int>",
    )
    rows = bloom_maybe_contains(probes, bloom, "k", M).collect()
    got = {r.k: (r.maybe_member, dict(r.payload)) for r in rows}
    assert got["key-3"] == (True, {"a": 1})
    assert got["stranger-9"][0] is False
    assert got["stranger-9"][1] == {"b": 2}


def test_null_keys_are_first_class(spark):
    """Regression: hash64(NULL) is NULL, so a NULL key used to produce a
    NULL position array — explode emitted ZERO rows and the key silently
    vanished from both the filter and the probe output.  With the
    sentinel canonicalization a NULL key is one ordinary distinct value."""
    from depositaja_spark.functions.bloom import bloom_prefilter_members

    hist = spark.createDataFrame([("a",), (None,)], "k string")
    inc = spark.createDataFrame([("a",), ("x",), (None,)], "k string")
    rows = bloom_prefilter_members(hist, inc, "k", m_bits=M).collect()
    assert len(rows) == 3, "no increment row may be dropped"
    got = {r.k: r.is_member for r in rows}
    assert got["a"] is True
    assert got["x"] is False
    assert got[None] is True  # NULL history key matches NULL increment key


def test_null_key_not_in_history_is_new(spark):
    from depositaja_spark.functions.bloom import bloom_prefilter_members

    hist = spark.createDataFrame([("a",), ("b",)], "k string")
    inc = spark.createDataFrame([(None,)], "k string")
    (row,) = bloom_prefilter_members(hist, inc, "k", m_bits=M).collect()
    assert row.is_member is False
