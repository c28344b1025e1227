"""Count-Min sketch: fixed-memory frequency estimation, mergeable
across partitions and across days.

Complements the other sketch families (queries_sketch.py): HLL answers
"how many distinct", Misra-Gries answers "which keys are heavy",
Count-Min answers "how often does THIS key occur" for ANY key — with a
d×w counter matrix whose size never depends on the key cardinality.
One-sided error: estimates never undercount, and overshoot is bounded
by N·e/w with probability 1−e^−d (Cormode & Muthukrishnan 2005).

Spark shape: the sketch IS a DataFrame of ``(row, pos, cnt)`` counter
cells — built by one explode (d rows per input) + one map-side-combined
groupBy count, merged by unioning cell frames and re-summing, probed by
an equi-join on (row, pos) + a min-over-rows aggregate.  Nothing ever
collects to the driver; a d=5 × w=65536 sketch is ≤ 327k cells ≈ a few
MB however large the input was.

Hashing reuses the deterministic Kirsch-Mitzenmacher scheme from the
Bloom filter (functions/bloom.py): row r probes position
``(h1 + r·h2) mod w`` — no RNG, identical across engines/runs, so the
collision-free regime is oracle-checkable exactly like the HLL sparse
regime (queries_sketch.py:_HLL_RSD note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.text import hash64

#: default depth: 5 rows → failure probability e^-5 ≈ 0.7% per probe
CMS_DEPTH = 5

_H2_SALT = "cms-h2:"

#: NULL keys are first-class: they canonicalize to this sentinel before
#: hashing (in BOTH build and estimate), because hash64(NULL) is NULL and
#: a NULL position would silently bank occurrences into unreachable cells
#: — an UNDERcount, the one error class CMS promises never to produce.
#: The \x00 prefix cannot collide with real keys cast from fixture types.
_NULL_KEY = "\x00<null>"


def _row_positions(key: Column, width: int, depth: int) -> Column:
    """Array of ``depth`` positions, one per sketch row (NULL-safe)."""
    k = F.coalesce(key, F.lit(_NULL_KEY))
    h1 = hash64(k)
    h2 = hash64(F.concat(F.lit(_H2_SALT), k)).bitwiseOR(F.lit(1).cast("long"))
    return F.array(*[F.pmod(h1 + F.lit(r) * h2, F.lit(width)) for r in range(depth)])


def cms_build(
    df: DataFrame, key_col: str, width: int, depth: int = CMS_DEPTH
) -> DataFrame:
    """Sketch ``df[key_col]`` → ``(row, pos, cnt)`` cells (zero cells
    absent).  One narrow shuffle of ≤ d·w rows per map task thanks to
    map-side partial counting; input volume never shuffles."""
    pos = df.select(
        F.posexplode(_row_positions(F.col(key_col).cast("string"), width, depth)).alias(
            "row", "pos"
        )
    )
    return pos.groupBy("row", "pos").agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum cell-wise — the linearity that makes CMS a daily-rollup
    structure (sketch each partition/day independently, merge later)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    probes: DataFrame,
    sketch: DataFrame,
    key_col: str,
    width: int,
    depth: int = CMS_DEPTH,
    *,
    out_col: str = "est_n",
) -> DataFrame:
    """Append the CMS frequency estimate for each probe key: min over
    the d rows' counters (missing cell = 0).  Join on (row, pos) is
    uniform-hash keyed — skew-free by construction."""
    cols = probes.columns
    exploded = probes.select(
        *cols,
        F.posexplode(_row_positions(F.col(key_col).cast("string"), width, depth)).alias(
            "row", "pos"
        ),
    )
    return (
        exploded.join(sketch, ["row", "pos"], "left")
        .groupBy(*cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(out_col))
    )
