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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_pairs"]


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
