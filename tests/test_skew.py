"""Skew-salting utility: equivalence with plain aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions.skew import salted_sum
from depositaja_spark.operators import valid_deposits
from depositaja_spark.sources import deposits_from_events, load_table

SF = "/root/testdata/sf0.001"


def test_salted_sum_equals_plain_sum(spark):
    d = valid_deposits(deposits_from_events(load_table(spark, SF, "events")))
    plain = {
        r.wallet_id: round(r.b, 4)
        for r in d.groupBy("wallet_id").agg(F.sum("amount").alias("b")).collect()
    }
    salted = {
        r.wallet_id: round(r.balance, 4)
        for r in salted_sum(d, "wallet_id", "amount", "balance").collect()
    }
    assert salted == plain


def test_salted_sum_on_hot_key(spark):
    """A pathologically hot key (90% of rows) still sums correctly."""
    rows = [("hot", 1.0)] * 900 + [("cold", 2.0)] * 100
    df = spark.createDataFrame(rows, "wallet_id string, amount double")
    got = {r.wallet_id: r.balance for r in salted_sum(df, "wallet_id", "amount", "balance", buckets=8).collect()}
    assert got == {"hot": pytest.approx(900.0), "cold": pytest.approx(200.0)}


# --- stop-shingle df cap (hot-shingle skew in the dedup inverted index) ------


def _boilerplate_corpus(spark, n_docs: int = 60):
    """Every document shares one boilerplate sentence (its shingles reach
    df = n_docs — the synthetic hot shingle); docs 0 and 1 additionally
    share a genuine near-duplicate body; every other body is unique."""
    boiler = "subscribe to our newsletter for updates every single day"
    rows = []
    for i in range(n_docs):
        if i in (0, 1):
            body = f"the quick brown fox jumps over the lazy dog variant {i}"
        else:
            body = f"unique content body number {i} " + " ".join(
                f"tok{i}x{j}" for j in range(8)
            )
        rows.append((i, body + " " + boiler))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stop_shingle_cap_kills_boilerplate_pairs(spark):
    """Uncapped, the shared boilerplate makes EVERY doc pair a candidate
    (quadratic bucket on the hot shingle); with the df cap the boilerplate
    shingles are dropped and only the genuine near-dup pair survives."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import jaccard_pairs

    docs = _boilerplate_corpus(spark)
    uncapped = jaccard_pairs(docs, n=3, threshold=0.01, max_df=None)
    n_uncapped = uncapped.count()
    release_caches()
    # every one of the 60*59/2 pairs shares the boilerplate shingles
    assert n_uncapped == 60 * 59 // 2

    capped = jaccard_pairs(docs, n=3, threshold=0.01, max_df=30)
    got = {(r.a_id, r.b_id) for r in capped.collect()}
    release_caches()
    assert got == {(0, 1)}  # only the genuine near-dup remains


def test_stop_shingle_cap_scores_over_filtered_universe(spark):
    """With the cap active, Jaccard is computed over the FILTERED shingle
    sets (sizes exclude boilerplate) — doc 0 vs doc 1 differ only in the
    trailing variant token, so filtered-universe Jaccard is high."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import jaccard_pairs, shingles

    docs = _boilerplate_corpus(spark)
    (pair,) = jaccard_pairs(docs, n=3, threshold=0.01, max_df=30).collect()
    release_caches()
    # hand-computed: bodies are 10-token sentences differing in the last
    # token ("variant 0" vs "variant 1") plus the dropped boilerplate
    sh0 = {r.shingle for r in shingles(docs.filter("doc_id = 0"), 3).collect()}
    sh1 = {r.shingle for r in shingles(docs.filter("doc_id = 1"), 3).collect()}
    boiler = {r.shingle for r in shingles(docs.filter("doc_id = 5"), 3).collect()}
    # the boilerplate-only shingles common to >30 docs
    hot = sh0 & sh1 & boiler
    a, b = sh0 - hot, sh1 - hot
    expected = len(a & b) / len(a | b)
    assert pair.jaccard == pytest.approx(expected, abs=1e-6)


def test_shingle_df_pass_is_not_a_window(spark):
    """The df annotation must come from a map-side-combined aggregation,
    never a Window.partitionBy("h"): a window puts every row of a hot
    shingle into ONE task (single-task sort straggler at web scale),
    while a groupBy collapses hot keys map-side.  Guard the physical
    plan so the skew-safe shape can't regress."""
    import contextlib
    import io

    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import jaccard_pairs

    docs = _boilerplate_corpus(spark)
    df = jaccard_pairs(docs, n=3, threshold=0.01, max_df=30)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    release_caches()
    assert "Window" not in buf.getvalue()


def test_minhash_verify_cap_bounds_giant_doc_sets(spark):
    """The MinHash verify arm caps each doc's collected shingle set
    (bottom-k sketch).  Two identical giant documents — shingle count far
    above a deliberately tiny cap — still verify at jaccard 1.0
    (identical sets have identical bottom-k), and the unrelated doc
    produces no spurious pair."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import minhash_lsh_dedup

    big = " ".join(f"w{i}" for i in range(3000))  # ≈3000 shingles ≫ cap
    rows = [(0, big), (1, big), (2, " ".join(f"z{i}" for i in range(200)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_lsh_dedup(
        docs, n=3, threshold=0.5, verify_max_shingles=256
    ).collect()
    release_caches()
    assert {(r.a_id, r.b_id) for r in got} == {(0, 1)}
    assert got[0].jaccard == 1.0


def test_containment_cap_matches_jaccard_cap_semantics(spark):
    """containment_pairs applies the same df cap: boilerplate alone
    produces no containment pairs once capped."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import containment_pairs

    docs = _boilerplate_corpus(spark)
    capped = containment_pairs(docs, n=3, threshold=0.3, max_df=30)
    got = {(r.a_id, r.b_id) for r in capped.collect()}
    release_caches()
    assert got == {(0, 1)}


# --- two-level bucket-offset running sum (sequence packing at scale) ---------


def _skewed_lang_corpus(spark, n_docs: int = 400):
    """90% of documents in one language — the English-dominance shape
    that makes a per-lang window a single-task sort at corpus scale."""
    rows = [
        (i, "en" if i % 10 else f"l{i % 4}", (i * 37) % 90 + 10)
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")


def test_bucketed_running_sum_equals_flat_window(spark):
    """Row-for-row equality with the naive PARTITION BY lang window, on a
    corpus where one language dominates and doc_ids are non-contiguous
    per language (buckets cut mid-language everywhere)."""
    from pyspark.sql import Window as W

    from depositaja_spark.functions.windows import bucketed_running_sum

    df = _skewed_lang_corpus(spark)
    flat_w = (
        W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    )
    flat = {
        (r.lang, r.doc_id): r.cum
        for r in df.withColumn("cum", F.sum("n_tokens").over(flat_w)).collect()
    }
    for width in (7, 64, 1000):  # 1000 > n_docs: degenerate single bucket
        got = {
            (r.lang, r.doc_id): r.cum
            for r in bucketed_running_sum(
                df, ["lang"], "doc_id", "n_tokens", bucket_width=width
            ).collect()
        }
        assert got == flat, f"divergence at bucket_width={width}"


def test_bucketed_running_sum_extra_order_cols(spark):
    """Tie-breaker columns (chunk_id within doc_id) sort inside a bucket
    and never affect offsets — the training_export shape."""
    from pyspark.sql import Window as W

    from depositaja_spark.functions.windows import bucketed_running_sum

    rows = [
        (d, c, "en" if d % 3 else "fr", 10 + c) for d in range(50) for c in range(d % 4 + 1)
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_id int, lang string, n_tokens int")
    flat_w = (
        W.partitionBy("lang")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    flat = {
        (r.lang, r.doc_id, r.chunk_id): r.cum
        for r in df.withColumn("cum", F.sum("n_tokens").over(flat_w)).collect()
    }
    got = {
        (r.lang, r.doc_id, r.chunk_id): r.cum
        for r in bucketed_running_sum(
            df, ["lang"], "doc_id", "n_tokens",
            extra_order_cols=["chunk_id"], bucket_width=16,
        ).collect()
    }
    assert got == flat


def test_bucketed_running_sum_no_per_lang_window(spark):
    """The physical plan's corpus-touching windows partition by
    (lang, bucket), never lang alone — the dominant language is spread
    over N/width sort tasks (the offsets window partitions by lang but
    runs over the aggregated per-bucket frame)."""
    from depositaja_spark.functions.windows import bucketed_running_sum

    df = _skewed_lang_corpus(spark)
    plan = (
        bucketed_running_sum(df, ["lang"], "doc_id", "n_tokens", bucket_width=7)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    import re

    for m in re.finditer(r"Window \[.*?\], \[([^\]]*)\], \[", plan):
        part_cols = {c.split("#")[0].strip() for c in m.group(1).split(",")}
        if part_cols == {"lang"}:
            # must be the offsets window — its child chain aggregates first
            assert "Aggregate" in plan[m.end():] or "HashAggregate" in plan


def test_capped_verify_unbiased_near_threshold(spark):
    """Bottom-k Jaccard over the UNION's k smallest hashes (ADVICE r4):
    a true-J≈0.6 pair where BOTH docs exceed the cap must survive a 0.5
    threshold.  The old |A_k∩B_k|/|A_k∪B_k| estimator scored this shape
    ≈0.43 and silently dropped it."""
    from depositaja_spark.functions.cache import release_caches
    from depositaja_spark.functions.dedup import minhash_lsh_dedup

    a = " ".join(f"w{i}" for i in range(2000))  # 1998 shingles ≫ cap
    b = " ".join(f"w{i}" for i in range(1200))  # prefix: J = 1198/1998 ≈ 0.60
    docs = spark.createDataFrame(
        [(0, a), (1, b), (2, " ".join(f"z{i}" for i in range(300)))],
        "doc_id long, text string",
    )
    got = minhash_lsh_dedup(
        docs, n=3, threshold=0.5, verify_max_shingles=256
    ).collect()
    release_caches()
    assert {(r.a_id, r.b_id) for r in got} == {(0, 1)}
    assert abs(got[0].jaccard - 0.5996) < 0.1  # union-sampled estimate


def test_salted_join_equals_plain_join(spark):
    """salted_join == plain join on a skewed fact (90% one key) for both
    inner and left joins, including the unmatched-fact-key case."""
    from depositaja_spark.functions.skew import salted_join

    fact = spark.createDataFrame(
        [("hot", i) for i in range(90)]
        + [("cold", i) for i in range(9)]
        + [("orphan", 99)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, tag string"
    )
    for how in ("inner", "left"):
        got = sorted(
            (r.k, r.v, r.tag)
            for r in salted_join(fact, dim, "k", buckets=7, how=how).collect()
        )
        want = sorted(
            (r.k, r.v, r.tag) for r in fact.join(dim, "k", how).collect()
        )
        assert got == want, how


def test_salted_join_rejects_right_joins(spark):
    """Replicating the dim side breaks right/full semantics — the helper
    must refuse rather than silently multiply unmatched dim rows."""
    from depositaja_spark.functions.skew import salted_join

    df = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")


def test_distributed_ntile_equals_flat_ntile(spark):
    """distributed_ntile == ntile(t) OVER (ORDER BY metric DESC, id) on
    random data including heavy ties (ties concentrate in one value
    bucket but never straddle a boundary) and n not divisible by t."""
    import random

    from pyspark.sql import Window as W

    from depositaja_spark.functions.windows import distributed_ntile

    rng = random.Random(11)
    rows = [(i, float(rng.choice([1.0, 2.0, 3.0, rng.uniform(0, 100)]))) for i in range(1003)]
    df = spark.createDataFrame(rows, "id long, v double").repartition(7)
    for t in (4, 7):
        got = {
            r.id: r.tile
            for r in distributed_ntile(df, "v", "id", t, 1003, "tile", n_buckets=8).collect()
        }
        want = {
            r.id: r.tile
            for r in df.select(
                "id",
                F.ntile(t).over(W.orderBy(F.desc("v"), F.asc("id"))).alias("tile"),
            ).collect()
        }
        assert got == want, t


def test_distributed_ntile_no_global_sort_window(spark):
    """The plan must contain no empty-partition Window (the single-task
    global sort the operator exists to avoid) — every WindowExec
    partitions by the value bucket."""
    import contextlib
    import io

    from depositaja_spark.functions.windows import distributed_ntile

    df = spark.range(1000).selectExpr("id", "CAST(id % 97 AS DOUBLE) AS v")
    out = distributed_ntile(df, "v", "id", 4, 1000, "tile")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    import re

    for m in re.finditer(r"Arguments: \[[^\]]*windowspecdefinition\(([^)]*)\)", p):
        spec = m.group(1)
        # row_number's spec lists partition cols first; _vb must be there
        assert "_vb" in spec, p


def test_grouped_ntile_cume_equals_flat_windows(spark):
    """grouped_ntile_cume == the flat per-group ntile + cume_dist
    windows on random data with heavy ties and uneven group sizes."""
    import random

    from pyspark.sql import Window as W

    from depositaja_spark.functions.windows import grouped_ntile_cume

    rng = random.Random(13)
    rows = []
    for i in range(1500):
        g = rng.choice(["a", "a", "a", "b", "c"])  # uneven groups
        v = float(rng.choice([5.0, 5.0, rng.uniform(0, 10)]))  # heavy ties
        rows.append((i, g, v))
    df = spark.createDataFrame(rows, "id long, g string, v double").repartition(7)
    got = {
        r.id: (r.quartile, r.cdist)
        for r in grouped_ntile_cume(df, "g", "v", "id", 4, n_buckets=8).collect()
    }
    w = W.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    wc = W.partitionBy("g").orderBy("v")
    want = {
        r.id: (r.quartile, r.cdist)
        for r in df.select(
            "id",
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.cume_dist().over(wc), 6).alias("cdist"),
        ).collect()
    }
    assert got == want
