"""Distributed Bloom filter: compact membership prefilter for
history-scale anti-joins.

The 100 TB problem this solves: incremental exact dedup
(functions/dedup.py:incremental_dedup) semi-joins every daily increment
against the FULL history fingerprint set — at 10^10 history keys that is
a shuffle of the entire history per ingest batch.  A Bloom filter built
ONCE over the history compresses it ~50× (BLOOM_BITS_PER_KEY bits/key
vs a 32-byte md5 hex fingerprint), is buildable in one map-side-combined
aggregation, is mergeable (bit-OR) across days, and answers "definitely
new" with ZERO false negatives — so the expensive exact join only ever
sees the (tiny) candidate subset that might be a duplicate.

Representation: a DataFrame of ``(word_idx: long, word: long)`` rows —
one row per SET 64-bit word of the bitmap, absent rows = all-zero words.
That keeps the filter a first-class distributed dataset: building it is
``explode → groupBy(word_idx) → bit_or`` (map-side partials shrink each
partition to ≤ m/64 rows before the one narrow shuffle), probing it is
an equi-join on ``word_idx`` (AQE broadcasts it while it fits — m=2^24
bits is 2 MB — and degrades to a shuffle join for a 10^11-key filter
sharded across executors; never a driver collect).

Hash scheme: Kirsch-Mitzenmacher double hashing — k positions
``(h1 + i·h2) mod m`` derived from two independent portable 60-bit
md5-prefix hashes (functions/text.py:hash64), so the filter is
DETERMINISTIC across runs, engines and partitionings (same property the
dedup oracles rely on; no seeded RNG anywhere).

There is no false-positive "estimate mode" exposed: callers compose the
filter with an exact verify join (bloom_prefilter_members), so results
are exact and the filter's only observable effect is pruning work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.text import hash64

#: bits per history key at the default sizing (m = BITS_PER_KEY × n keys,
#: rounded up to a power of two by callers that care).  16 bits/key with
#: k=7 hashes gives a false-positive rate ≈ 0.2% — each day's exact
#: verify join then touches ~0.2% of the increment plus the true dups.
BLOOM_BITS_PER_KEY = 16

#: number of hash functions; ≈ 0.7 × bits-per-key is optimal, 7 for 16.
BLOOM_K = 7

_H2_SALT = "bloom-h2:"

#: NULL keys canonicalize to this sentinel before hashing: hash64(NULL)
#: is NULL, so a NULL key would otherwise produce a NULL position array —
#: explode() then emits ZERO rows and the key silently vanishes from both
#: the built filter and the probe output (a dropped row, worse than a
#: wrong verdict).  With the sentinel, NULL behaves as one ordinary
#: distinct value — the same null-safe-equality semantics the exact
#: verify join uses.  The \x00 prefix cannot collide with cast strings.
_NULL_KEY = "\x00<null>"


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for ``key`` via Kirsch-Mitzenmacher:
    p_i = (h1 + i·h2) mod m, with h1/h2 independent 60-bit hashes.
    h2 is forced odd so the k positions never collapse onto one value
    when m is a power of two.  NULL-safe (see _NULL_KEY)."""
    kk = F.coalesce(key, F.lit(_NULL_KEY))
    h1 = hash64(kk)
    h2 = hash64(F.concat(F.lit(_H2_SALT), kk)).bitwiseOR(F.lit(1).cast("long"))
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = BLOOM_K,
) -> DataFrame:
    """Build the filter over ``df[key_col]`` → ``(word_idx, word)`` rows.

    One explode (k rows per key, map-local) + one groupBy(word_idx) with
    a ``bit_or`` aggregate — map-side partial OR means the shuffle moves
    at most m/64 rows per map task regardless of input size.  Mergeable:
    union two filters' rows and re-``bit_or`` by word_idx (used by
    day-over-day history growth; see tests/test_bloom.py merge law).
    """
    pos = df.select(
        F.explode(_positions(F.col(key_col).cast("string"), m_bits, k)).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_maybe_contains(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    k: int = BLOOM_K,
    *,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Append ``out_col``: false ⇒ key DEFINITELY not in the built set
    (no false negatives); true ⇒ membership must be verified exactly.

    Probe plan: tag each probe row with ``monotonically_increasing_id``,
    explode its k positions, LEFT equi-join the filter on word_idx
    (absent word ⇒ zero word ⇒ miss), then a groupBy on the tag checking
    every one of the k bits was set (``min(hit) == 1``).  Grouping on
    the unique tag — not on the probe columns — preserves row
    cardinality (duplicate probe rows each get their own verdict) and
    tolerates non-groupable probe columns (e.g. map-typed); the
    original columns are recovered with ``first()`` inside the same
    aggregate, which is exact because every row in a tag group came
    from the same probe row.  Both shuffles are on uniform keys — no
    skew by construction.

    The tagged frame is PINNED with an eager ``localCheckpoint`` before
    the explode: ``monotonically_increasing_id`` is nondeterministic
    under stage recompute, so an unpinned tag could be reassigned
    between already-fetched and refetched map outputs after a fetch
    failure — splitting one probe row's k bits across two groups or
    merging two rows under one tag (a silent FALSE NEGATIVE, the one
    error class a Bloom filter must never produce).  Checkpointed
    blocks make the tags plain data: a lost block fails the job loudly
    instead of corrupting verdicts (on clusters with preemption, swap
    in reliable ``checkpoint()``).  Blocks are registered with the
    cache registry, so the caller's normal ``release_caches()`` retires
    them.
    """
    from depositaja_spark.functions.cache import pinned_rdd_ids, track_pinned_rdds

    sc = probe.sparkSession.sparkContext
    cols = probe.columns
    before = pinned_rdd_ids(sc)
    tagged = probe.withColumn(
        "_bloom_pid", F.monotonically_increasing_id()
    ).localCheckpoint()
    track_pinned_rdds(sc, pinned_rdd_ids(sc) - before)
    probed = (
        tagged
        .select(
            *cols,
            "_bloom_pid",
            F.posexplode(_positions(F.col(key_col).cast("string"), m_bits, k)).alias("i", "p"),
        )
        .select(
            *cols,
            "_bloom_pid",
            (F.col("p") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("mask"),
        )
        .join(bloom, "word_idx", "left")
        .select(
            *cols,
            "_bloom_pid",
            (
                F.coalesce(F.col("word"), F.lit(0).cast("long")).bitwiseAND(F.col("mask"))
                != 0
            ).cast("int").alias("hit"),
        )
        .groupBy("_bloom_pid")
        .agg(
            *[F.first(c).alias(c) for c in cols],
            (F.min("hit") == F.lit(1)).alias(out_col),
        )
        .drop("_bloom_pid")
    )
    return probed


def bloom_prefilter_members(
    history: DataFrame,
    increment: DataFrame,
    key_col: str,
    *,
    m_bits: int,
    k: int = BLOOM_K,
    out_col: str = "is_member",
) -> DataFrame:
    """EXACT membership of ``increment[key_col]`` in ``history[key_col]``,
    computed as bloom-prefilter → exact verify:

    1. ``bloom_build(history)`` — one pass over the history (in
       production: built at ingest and merged daily, never rebuilt).
    2. ``bloom_maybe_contains(increment)`` — joins only the 2 MB-per-2^24
       -bit filter, not the history.
    3. exact join of ONLY the maybe-members against the history key set —
       false positives die here, so ``out_col`` is exact.  The
       definitely-new majority skips the join entirely; the increment
       side of the verify shuffle is the FP rate × increment (≈0.2%),
       and in production the history side is a bucketed fingerprint
       index, so verify is a co-located probe rather than a history
       reshuffle.

    Returns ``increment`` columns + boolean ``out_col``, preserving row
    cardinality: duplicate increment rows each carry their own verdict
    (the probe groups on a unique row tag, not on the probe columns).
    """
    maybed = bloom_maybe_contains(increment, bloom_build(history, key_col, m_bits, k),
                                  key_col, m_bits, k, out_col="_maybe")
    inc_cols = increment.columns
    hist_keys = (
        history.select(F.col(key_col).alias("_hk")).distinct().withColumn("_hit", F.lit(1))
    )
    # null-safe equality: NULL keys hash via the _NULL_KEY sentinel, so
    # the verify join must treat NULL==NULL as a match too or a NULL
    # increment key could never be confirmed against a NULL history key
    # (the _hit marker, not _hk itself, carries the verdict — a matched
    # NULL history key is still a NULL _hk)
    verified = (
        maybed.filter(F.col("_maybe"))
        .join(hist_keys, F.col(key_col).eqNullSafe(F.col("_hk")), "left")
        .select(*inc_cols, F.col("_hit").isNotNull().alias(out_col))
    )
    misses = (
        maybed.filter(~F.col("_maybe")).select(*inc_cols, F.lit(False).alias(out_col))
    )
    return verified.unionByName(misses)
