"""Edit-distance similarity join: q-gram prefilter + exact verify.

Record linkage / fuzzy dedup (product names, author names, entity
aliases) needs all pairs within Levenshtein distance k — and the naive
form is an all-pairs cross join with a dynamic-programming distance in
the filter, quadratic in the DISTINCT value count.  The classic scale
decomposition (ED-Join / PassJoin literature) is filter-then-verify:

1. **Candidate generation by q-gram overlap.**  An edit operation
   destroys at most q of a string's overlapping q-grams, so two strings
   within distance k share at least (L_min − q + 1) − k·q q-grams.
   When that bound is ≥ 1 — i.e. L_min ≥ q·(k+1) — a single-shared-gram
   inverted-index equi-join is a COMPLETE candidate generator: explode
   each string to its distinct q-grams, self-join on the gram, dedupe.
   Keyed shuffle, never a cartesian; gram frequency skew is the
   df-capped-shingle problem and AQE's skew join handles the hot grams
   (a df cap like dedup's would trade completeness, so it is NOT
   applied here).
2. **Short-string fallback.**  Strings shorter than q·(k+1) can share
   zero q-grams at distance ≤ k, so they go through a banded
   length-bucket join instead (each string emits its length and the k
   lengths above; equi-join on the band) — complete because distance ≤ k
   forces |len difference| ≤ k.  All-pairs *within a length band* of the
   short-string population only; short distinct strings are a bounded
   set in practice and the band join is still keyed.
3. **Exact verify.**  levenshtein() ≤ k on the candidate sliver only,
   after the free |len diff| ≤ k cut.  The expensive DP runs on
   candidates, not on the quadratic pair space.

Everything operates on DISTINCT strings — values repeat heavily in fact
columns, and verifying a pair once instead of (multiplicity²) times is
the first 100× saved.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "JW_MAX_BLOCK",
    "edit_distance_pairs",
    "jaro_winkler_pairs",
    "jaro_winkler_udf",
]


def edit_distance_pairs(
    strings: DataFrame,
    col: str = "s",
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All distinct-value pairs within Levenshtein distance ``max_dist``.

    Returns ``(name_a, name_b, dist)`` with ``name_a < name_b`` — each
    unordered pair once.  Complete (no missed pairs): the q-gram tier
    covers strings of length ≥ q·(max_dist+1), the length-band tier
    covers the rest and the boundary-crossing pairs.
    """
    k, qq = int(max_dist), int(q)
    min_safe = qq * (k + 1)
    s = strings.select(F.col(col).alias("s")).where(F.col("s").isNotNull()).distinct()
    slen = s.select("s", F.length("s").alias("ln"))

    long_s = slen.filter(F.col("ln") >= min_safe)
    # the band tier must also see longs near the boundary: a short string
    # (ln < min_safe) can pair with a long one up to min_safe + k − 1
    bandable = slen.filter(F.col("ln") < min_safe + k)
    short_s = slen.filter(F.col("ln") < min_safe)

    # --- q-gram tier: inverted index on distinct grams -----------------------
    grams = long_s.select(
        "s",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, length(s) - {qq} + 1),"
                    f" i -> substring(s, i, {qq}))"
                )
            )
        ).alias("g"),
    )
    ga = grams.select(F.col("s").alias("sa"), "g")
    gb = grams.select(F.col("s").alias("sb"), "g")
    cand_gram = (
        ga.join(gb, "g")
        .filter(F.col("sa") < F.col("sb"))
        .select("sa", "sb")
        .distinct()
    )

    # --- length-band tier: short strings (and boundary longs) ---------------
    probe = short_s.select(
        F.col("s").alias("sa"),
        F.explode(F.sequence(F.col("ln"), F.col("ln") + k)).alias("lb"),
    )
    base = bandable.select(F.col("s").alias("sb"), F.col("ln").alias("lb"))
    cand_band = (
        probe.join(base, "lb")
        .filter(F.col("sa") != F.col("sb"))
        .select(
            F.least("sa", "sb").alias("sa"), F.greatest("sa", "sb").alias("sb")
        )
        .distinct()
    )

    cand = cand_gram.unionByName(cand_band).distinct()
    # cheap length cut, then the O(len²) DP.  Catalyst pushes the dist
    # predicate (alias-substituted) down INTO the candidate joins — the
    # desirable outcome: the DP prunes pairs before the distinct
    # aggregate ever sees them, and the only repeat evaluation left is
    # one DP per SURVIVING distinct pair in the output projection
    # (bounded by the result size, not the candidate count)
    return (
        cand.filter(F.abs(F.length("sa") - F.length("sb")) <= k)
        .withColumn("dist", F.levenshtein("sa", "sb").cast("int"))
        .filter(F.col("dist") <= k)
        .select(
            F.col("sa").alias("name_a"),
            F.col("sb").alias("name_b"),
            "dist",
        )
    )


def jaro_winkler_udf():
    """Arrow-batched Jaro-Winkler similarity (p=0.1, prefix ≤ 4, boost
    threshold 0.7 — the textbook parameterization DuckDB's
    ``jaro_winkler_similarity`` also uses, verified value-identical on
    the fixture corpus + the published Winkler test vectors).  Two-empty
    -strings returns 0.0, matching DuckDB's convention.  A pandas UDF
    because the matching/transposition scan has no builtin-expression
    form; it runs on the block-join's candidate sliver only, never the
    pair space."""
    from pyspark.sql.functions import pandas_udf

    def _jw(s1: str, s2: str) -> float:
        l1, l2 = len(s1), len(s2)
        if l1 == 0 or l2 == 0:
            return 0.0
        if s1 == s2:
            return 1.0
        match_dist = max(l1, l2) // 2 - 1
        m1 = [False] * l1
        m2 = [False] * l2
        m = 0
        for i, c in enumerate(s1):
            lo = 0 if i <= match_dist else i - match_dist
            hi = min(l2, i + match_dist + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    m += 1
                    break
        if m == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        j = (m / l1 + m / l2 + (m - t) / m) / 3.0
        if j <= 0.7:
            return j
        pre = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            pre += 1
        return j + pre * 0.1 * (1.0 - j)

    @pandas_udf("double")
    def jw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_jw(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
        )

    return jw


#: blocks larger than this are dropped before the within-block pair join
#: (the cap_baskets discipline: a hot prefix must not inject |block|²
#: candidate pairs; the oracle mirrors the identical cut)
JW_MAX_BLOCK = 10_000


def jaro_winkler_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    q_col: str = "q",
    c_col: str = "c",
    threshold: float = 0.9,
    block_prefix: int = 2,
    max_block: int = JW_MAX_BLOCK,
) -> DataFrame:
    """Blocked Jaro-Winkler record linkage: match every distinct query
    string against every distinct corpus string sharing its first
    ``block_prefix`` characters (the standard ER blocking key — JW's
    Winkler boost already privileges shared prefixes, so prefix blocks
    lose only pairs the scorer itself down-weights), keep matches with
    similarity ≥ ``threshold``.  Returns ``(query_name, match_name,
    jw)``.  Keyed equi-join on the block, never a cartesian; blocks
    above ``max_block`` corpus strings are dropped whole (hot-prefix
    skew guard, mirrored by the oracle)."""
    jw = jaro_winkler_udf()
    qd = (
        queries.select(F.col(q_col).alias("query_name"))
        .where(F.col("query_name").isNotNull())
        .distinct()
        .withColumn("blk", F.substring("query_name", 1, block_prefix))
    )
    cd = (
        corpus.select(F.col(c_col).alias("match_name"))
        .where(F.col("match_name").isNotNull())
        .distinct()
        .withColumn("blk", F.substring("match_name", 1, block_prefix))
    )
    kept_blocks = (
        cd.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_block)
        .select("blk")
    )
    # threshold on the ROUND-6 score (the repo's pinning convention):
    # the raw kernel and the oracle's native scorer agree to ~1e-12 but
    # not bitwise, so cutting on the raw value could keep different row
    # sets when a pair lands within float noise of the threshold
    return (
        qd.join(kept_blocks, "blk")
        .join(cd, "blk")
        .withColumn("jw", F.round(jw(F.col("query_name"), F.col("match_name")), 6))
        .filter(F.col("jw") >= F.lit(threshold))
        .select("query_name", "match_name", "jw")
    )
