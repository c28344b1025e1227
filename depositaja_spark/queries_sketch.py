"""Sketch aggregates and multi-dimensional grouping.

Sketches are the 100 TB workhorses for cardinality and quantiles: fixed
memory per group, mergeable across partitions (map-side partial → one
small shuffle), rerunnable over any data volume.

Checking strategy: HLL cardinality estimates are implementation-defined
→ rows-only for the driver, with error bounds + the merge law asserted
in tests/test_sketch.py.  The GK quantile sketch is EXACT while a group
holds fewer rows than its accuracy parameter, so quantile_sketch_values
runs at an accuracy that pins it value-for-value against DuckDB's
quantile_disc (full oracle); the approximate regime's rank-error bound
is separately pinned in tests at a deliberately tiny accuracy.
``cube_order_stats`` (CUBE) and ``stratified_sample`` (salted-hash
Bernoulli) are deterministic and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from depositaja_spark.queries_ext import _H64
from depositaja_spark.registry import NO_ORACLE_OK, query
from depositaja_spark.sources import load_table


# --- CUBE --------------------------------------------------------------------

_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_order_stats", _CUBE_SQL)
def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 2^2 grouping sets in one pass —
    Spark expands the sets map-side, so it stays a single shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


# --- sketches (rows-only; accuracy asserted in tests) ------------------------


#: rsd for approx_count_distinct: HLL++ stays in its SPARSE (exact)
#: representation while the distinct count is far below the register
#: count m = 1/rsd² = 40 000 — every tested sf's per-type user count
#: (15 / 150 / 1 500) sits deep inside that regime, so the sketch
#: answer equals the exact count and the DuckDB count(DISTINCT) oracle
#: pins it value-for-value.  The DataSketches HLL (lgK=12) is likewise
#: exact below its LIST/SET→HLL promotion (~3 072).  The estimating
#: regime's error bound is separately asserted in tests/test_sketch.py.
_HLL_RSD = 0.005


@query(
    "sketch_distinct_users",
    """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS approx_users,
       CAST(count(DISTINCT user_id) AS BIGINT) AS hll_users
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality sketches per event_type: HyperLogLog++
    (approx_count_distinct) and the Apache DataSketches HLL
    (hll_sketch_agg → hll_sketch_estimate) side by side.  Both are
    map-side-mergeable constant-memory aggregates — the only way distinct
    counting survives 100 TB.  Oracle-checked against the exact
    count(DISTINCT): both sketches are in their exact (sparse) regime at
    every tested cardinality (see _HLL_RSD note)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", _HLL_RSD).alias("approx_users"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll_users"),
        )
        .orderBy("event_type")
    )


@query(
    "hll_event_type_overlap",
    """
WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1),
i AS (SELECT a.event_type AS ta, b.event_type AS tb, CAST(count(*) AS BIGINT) AS inter
      FROM s a JOIN s b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT ca.event_type AS type_a, cb.event_type AS type_b,
       ca.n AS users_a, cb.n AS users_b,
       ca.n + cb.n - COALESCE(i.inter, 0) AS users_union,
       COALESCE(i.inter, 0) AS users_intersect,
       CAST(COALESCE(i.inter, 0) AS DOUBLE)
         / (ca.n + cb.n - COALESCE(i.inter, 0)) AS jaccard
FROM c ca
JOIN c cb ON ca.event_type < cb.event_type
LEFT JOIN i ON i.ta = ca.event_type AND i.tb = cb.event_type
""",
)
def q_hll_event_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap between every event-type pair via HLL SKETCH
    ALGEBRA: per-type DataSketches HLL built in ONE corpus pass, pair
    union by hll_union on the |types|-row sketch frame, intersection by
    inclusion–exclusion |A|+|B|−|A∪B|, Jaccard from the estimates.
    This is how audience/reach overlap is computed at 100 TB — sketches
    are mergeable summaries, so the pair stage touches |types|² sketch
    bytes, never the corpus, and the same sketches serve any later
    union (mergeability is the whole point).

    Oracle-checkable for the same reason sketch_distinct_users is: at
    driver cardinalities every sketch (and every union of them — the
    union of sparse sketches stays sparse) is in its exact regime, so
    the estimates equal the exact distinct counts the oracle computes;
    the sketch error bound outside that regime is asserted separately
    in tests/test_sketch.py."""
    events = load_table(spark, sf_dir, "events")
    # ONE sketch aggregation; the per-type estimate is a projection over
    # the aggregated sketch, not a second pass
    sk = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    ).select("event_type", "sk", F.hll_sketch_estimate(F.col("sk")).alias("n"))
    a = sk.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"), F.col("n").alias("users_a")
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"), F.col("n").alias("users_b")
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).select(
        "type_a", "type_b", "users_a", "users_b",
        F.hll_sketch_estimate(F.hll_union(F.col("sk_a"), F.col("sk_b"))).alias("users_union"),
    )
    return pairs.select(
        "type_a", "type_b", "users_a", "users_b", "users_union",
        (F.col("users_a") + F.col("users_b") - F.col("users_union")).alias("users_intersect"),
        (
            (F.col("users_a") + F.col("users_b") - F.col("users_union")).cast("double")
            / F.col("users_union")
        ).alias("jaccard"),
    )


#: the GK sketch stores ≤ accuracy values, so results are EXACT while a
#: group holds fewer rows — pinning the exact regime under the DuckDB
#: oracle (quantile_disc agrees value-for-value there).  Above it the
#: sketch degrades gracefully to its ±1/accuracy rank guarantee, which
#: tests/test_sketch.py bounds against exact quantiles at a deliberately
#: tiny accuracy (the sketch regime the driver data never reaches).
_QUANTILE_ACCURACY = 1_000_000


@query(
    "quantile_sketch_values",
    """
SELECT event_type,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.95) AS p95,
       quantile_disc(value, 0.99) AS p99
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_quantile_sketch_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-quantile sketch per event_type: percentile_approx
    (Greenwald-Khanna) for p50/p95/p99 of the value column — fixed-memory,
    mergeable.  Oracle-checked against DuckDB's exact discrete quantiles:
    both return an OBSERVED value at the target rank, and the sketch is
    exact below _QUANTILE_ACCURACY rows per group (see constant)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx(
                "value", [0.5, 0.95, 0.99], _QUANTILE_ACCURACY
            ).alias("quantiles")
        )
        .select(
            "event_type",
            F.col("quantiles")[0].alias("p50"),
            F.col("quantiles")[1].alias("p95"),
            F.col("quantiles")[2].alias("p99"),
        )
        .orderBy("event_type")
    )


#: per-stratum keep thresholds on the first 4 hex chars of a salted md5:
#: keep iff prefix < threshold, so the kept fraction is thresh/0x10000
#: ('zzzz' sorts above every hex string = keep all; '0000' = keep none)
_STRAT_SALT = "strat-v1:"
_STRAT_THRESH = {
    "purchase": "8000",  # 0.500
    "click": "199a",     # ≈0.100
    "view": "199a",      # ≈0.100
    "error": "zzzz",     # 1.000
    "signup": "0000",    # 0.000
}


@query(
    "stratified_sample",
    f"""
SELECT event_id, event_type, user_id
FROM events
WHERE substr(md5('{_STRAT_SALT}' || CAST(event_id AS VARCHAR)), 1, 4)
      < CASE event_type
          WHEN 'purchase' THEN '{_STRAT_THRESH["purchase"]}'
          WHEN 'click'    THEN '{_STRAT_THRESH["click"]}'
          WHEN 'view'     THEN '{_STRAT_THRESH["view"]}'
          WHEN 'error'    THEN '{_STRAT_THRESH["error"]}'
          ELSE '{_STRAT_THRESH["signup"]}'
        END
""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sampling by salted hash: per-event_type keep
    fractions decided by md5(salt, event_id) — the corpus-downsampling
    primitive (rebalancing domains before training), made DETERMINISTIC:
    membership depends only on (salt, key), never on partitioning or an
    RNG stream, so re-runs, backfills and engine changes keep identical
    rows (the same property train_val_split/mixture_sample rely on —
    sampleBy's seeded RNG is partitioning-dependent and can't be
    oracle-checked).  Scan-local projection + filter, no shuffle."""
    events = load_table(spark, sf_dir, "events")
    frac = F.substring(
        F.md5(F.concat(F.lit(_STRAT_SALT), F.col("event_id").cast("string"))), 1, 4
    )
    thresh = F.when(
        F.col("event_type") == "purchase", _STRAT_THRESH["purchase"]
    ).when(F.col("event_type") == "click", _STRAT_THRESH["click"]).when(
        F.col("event_type") == "view", _STRAT_THRESH["view"]
    ).when(F.col("event_type") == "error", _STRAT_THRESH["error"]).otherwise(
        _STRAT_THRESH["signup"]
    )
    return events.filter(frac < thresh).select("event_id", "event_type", "user_id")


def _kmeans_sizes_sql() -> str:
    from depositaja_spark.functions.kmeans_artifact import centroid_values_sql

    return f"""
WITH cent(cluster, w) AS (VALUES
       {centroid_values_sql()}),
v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (SELECT v.vec_id, c.cluster,
             list_inner_product(v.v, v.v)
             - 2 * list_inner_product(v.v, c.w)
             + list_inner_product(c.w, c.w) AS d2
      FROM v CROSS JOIN cent c),
asg AS (SELECT vec_id, cluster
        FROM (SELECT vec_id, cluster,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d2, cluster) AS rn
              FROM d)
        WHERE rn = 1)
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(count(*) AS BIGINT) AS n_members
FROM asg GROUP BY cluster
"""


@query("kmeans_cluster_sizes", _kmeans_sizes_sql())
def q_kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster membership of the embedding corpus under the PINNED
    k-means model (functions/kmeans_artifact.py — centroids fit once at
    sf0.01 with the repo's own distributed Lloyd iteration, frozen as
    literals): the deployed-clustering-model scoring pass, exactly how a
    production corpus is bucketed (the clustering is a versioned
    artifact, not re-fit per job).  Pinning makes the query fully
    oracle-checkable — assignment is relational argmin over the same
    literals, the size count a GROUP BY.  (Rows-only through round 8,
    when the query re-fit per run.)  The iterative FIT keeps its own
    gates: tests/test_kmeans.py invariants (objective monotonicity,
    blob recovery, hash-race determinism) + the provenance re-fit in
    tests/test_semdedup.py.  Engine side: one Arrow-batched matmul
    against the broadcast C×d matrix, then a k-row keyed agg — no
    shuffle before the k-row aggregation."""
    from pyspark.sql import functions as FF

    from depositaja_spark.functions.kmeans import assign_clusters
    from depositaja_spark.functions.kmeans_artifact import KMEANS_CENTROIDS

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        assign_clusters(emb, KMEANS_CENTROIDS)
        .groupBy("cluster")
        .agg(FF.count(FF.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )


# --- Misra-Gries heavy hitters ----------------------------------------------

_MG_K = 16


@query(
    "heavy_hitter_events",
    f"""
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
HAVING count(*) > (SELECT count(*) FROM events) / {_MG_K + 1}
""",
)
def q_heavy_hitter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy event types (frequency > n/{_MG_K + 1}) via the
    sketch-then-verify plan: per-partition Misra-Gries summaries (≤
    {_MG_K} counters each, fixed memory, no shuffle) propose candidates
    — a guaranteed superset of the true heavy hitters — and an exact
    count over the semi-joined candidates applies the threshold.  The
    composition is exactly the oracle's HAVING, which is what makes a
    sketch query fully value-checkable; the sketch-side guarantees
    (superset property, bounded counters, planted-skew recovery) are
    pinned separately in tests/test_sketch.py."""
    from depositaja_spark.functions.heavyhitters import heavy_hitters_verified

    events = load_table(spark, sf_dir, "events")
    return heavy_hitters_verified(events, "event_type", _MG_K)


# --- Count-Min sketch ---------------------------------------------------------

#: collision-free regime for the registered query: 5 event types into
#: w=4096 positions per row — the d=5-row min makes a same-cell collision
#: among all rows essentially impossible (p ≈ (5/4096)^5), and with NO
#: collision the CMS estimate is EXACT, so the count(*) oracle pins it
#: value-for-value (same construction as _HLL_RSD / _QUANTILE_ACCURACY).
#: The estimating regime's one-sided N·e/w bound is asserted in
#: tests/test_countmin.py at a deliberately tiny width.
_CMS_WIDTH = 4096


@query(
    "cms_event_counts",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS est_n
FROM events GROUP BY event_type
""",
)
def q_cms_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key frequency via a Count-Min sketch (functions/countmin.py):
    the d×w counter matrix is built in one map-side-combined pass (the
    input never shuffles — only ≤ d·w cells per task do), merges across
    days by cell-wise sum, and answers any key's frequency from d
    counter lookups.  Probes here are the distinct event types; the
    registered width puts the sketch in its collision-free (exact)
    regime — see _CMS_WIDTH."""
    from depositaja_spark.functions.countmin import cms_build, cms_estimate

    events = load_table(spark, sf_dir, "events")
    sketch = cms_build(events, "event_type", _CMS_WIDTH)
    probes = events.select("event_type").distinct()
    return cms_estimate(probes, sketch, "event_type", _CMS_WIDTH)


# --- Poisson bootstrap confidence intervals ----------------------------------
#
# The distributed bootstrap: classical resampling-with-replacement needs
# the full dataset per replica, which doesn't distribute.  The Poisson
# bootstrap replaces each replica's multinomial row counts with
# independent Poisson(1) weights — each row carries its own weight per
# replica, computed LOCALLY from a deterministic hash, so B replicas are
# one explode + one keyed aggregation and the data is read once.  For
# n ≫ B the replica distributions converge to the classical bootstrap.
# Weights are capped at 5 (cdf 0.9963…); the truncation is identical in
# both engines so the oracle replays it exactly.

_BOOT_B = 32
#: Poisson(1) cumulative thresholds for k = 0..4 (k = 5 beyond), as
#: exact double reprs shared by the Spark plan and the DuckDB oracle
_BOOT_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
)
_BOOT_SCALE = 1 << 60  # hash64 is 60-bit: u = h / 2^60 ∈ [0, 1)


def _boot_case_sql(u: str) -> str:
    whens = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_BOOT_CDF)
    )
    return f"CASE {whens} ELSE 5 END"


@query(
    "bootstrap_value_ci",
    f"""
WITH rep AS (
  SELECT event_type, value, b,
         CAST({_H64.format(x="CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")}
              AS DOUBLE) / {_BOOT_SCALE} AS u
  FROM events CROSS JOIN (SELECT unnest(range(0, {_BOOT_B})) AS b)
),
w AS (SELECT event_type, b, value, {_boot_case_sql('u')} AS k FROM rep),
m AS (
  SELECT event_type, b, sum(k * value) / sum(k) AS mu
  FROM w GROUP BY 1, 2
  HAVING sum(k) > 0
)
SELECT event_type,
       round(quantile_cont(mu, 0.5), 4) AS boot_median,
       round(quantile_cont(mu, 0.025), 4) AS ci_lo,
       round(quantile_cont(mu, 0.975), 4) AS ci_hi
FROM m GROUP BY 1
""",
)
def q_bootstrap_value_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for each event type's mean
    value, via the POISSON bootstrap (the distributed formulation:
    per-row Poisson(1) weights from a deterministic hash instead of
    global multinomial resampling, so B replicas cost one explode + one
    keyed aggregation over a single pass of the data).

    Scale shape: the explode multiplies shuffle input by B (=32) but
    map-side combine collapses it to |types|×B partial cells per task;
    replica means are a (type, b)-keyed aggregation; the interval is an
    exact percentile over B replica means per type (a ≤B-row frame).
    Every random draw is hash64(event_id:b)/2^60 — deterministic,
    engine-identical, and independent across replicas, so the oracle
    replays the exact resampling."""
    from depositaja_spark.functions.text import hash64

    ev = load_table(spark, sf_dir, "events")
    rep = ev.select(
        "event_type",
        "value",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        hash64(
            F.concat(
                F.col("event_id").cast("string"), F.lit(":"), F.col("b").cast("string")
            )
        ).cast("double")
        / F.lit(float(_BOOT_SCALE))
    )
    k = F.lit(5)
    for kk, c in reversed(list(enumerate(_BOOT_CDF))):
        k = F.when(u < float(c), kk).otherwise(k)
    w = rep.select("event_type", "b", "value", k.alias("k"))
    m = (
        w.groupBy("event_type", "b")
        .agg(
            F.sum(F.col("k") * F.col("value")).alias("skv"),
            F.sum("k").alias("sk"),
        )
        .filter(F.col("sk") > 0)
        .select("event_type", "b", (F.col("skv") / F.col("sk")).alias("mu"))
    )
    pct = F.percentile(
        F.col("mu"), F.array(F.lit(0.5), F.lit(0.025), F.lit(0.975))
    )
    return (
        m.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.element_at("p", 1), 4).alias("boot_median"),
            F.round(F.element_at("p", 2), 4).alias("ci_lo"),
            F.round(F.element_at("p", 3), 4).alias("ci_hi"),
        )
    )
