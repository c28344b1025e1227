"""Sketch aggregates and multi-dimensional grouping.

Sketches are the 100 TB workhorses for cardinality and quantiles: fixed
memory per group, mergeable across partitions (map-side partial → one
small shuffle), rerunnable over any data volume.  Their estimates are
implementation-defined, so the driver records rows-only for them; accuracy
(relative error vs exact) and mergeability are asserted in
tests/test_sketch.py instead.

``cube_order_stats`` (CUBE) is deterministic and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


@query("sketch_distinct_users")
def q_sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality sketches per event_type: HyperLogLog++
    (approx_count_distinct) and the Apache DataSketches HLL
    (hll_sketch_agg → hll_sketch_estimate) side by side.  Both are
    map-side-mergeable constant-memory aggregates — the only way distinct
    counting survives 100 TB.  Estimates are implementation-defined →
    rows-only for the driver; tests/test_sketch.py bounds the error vs the
    exact count."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("hll_users"),
        )
        .orderBy("event_type")
    )


NO_ORACLE_OK.add("sketch_distinct_users")


@query("quantile_sketch_values")
def q_quantile_sketch_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-quantile sketch per event_type: percentile_approx
    (Greenwald-Khanna) for p50/p95/p99 of the value column — fixed-memory,
    mergeable; rows-only for the driver, error-bounded in tests."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10_000).alias("quantiles")
        )
        .select(
            "event_type",
            F.col("quantiles")[0].alias("p50"),
            F.col("quantiles")[1].alias("p95"),
            F.col("quantiles")[2].alias("p99"),
        )
        .orderBy("event_type")
    )


NO_ORACLE_OK.add("quantile_sketch_values")


@query("stratified_sample")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy with a fixed seed): per-event_type
    Bernoulli fractions — the standard corpus-downsampling primitive
    (e.g. rebalancing domains before training).  Scan-local, no shuffle.
    Sampling is seed-and-partitioning dependent → rows-only for the
    driver; fraction accuracy and determinism asserted in
    tests/test_sketch.py."""
    events = load_table(spark, sf_dir, "events")
    return events.sampleBy(
        "event_type",
        fractions={"purchase": 0.5, "click": 0.1, "view": 0.1, "error": 1.0, "signup": 0.0},
        seed=42,
    ).select("event_id", "event_type", "user_id")


NO_ORACLE_OK.add("stratified_sample")


@query("kmeans_cluster_sizes")
def q_kmeans_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (functions/kmeans.py) trained 3 iterations over the
    embedding corpus, reporting per-cluster membership — the iterative-
    algorithm surface (IVF quantizer training, corpus clustering).
    Iterative fixpoints are not SQL-expressible → rows-only for the
    driver; objective monotonicity and blob recovery are asserted in
    tests/test_kmeans.py."""
    from pyspark.sql import functions as FF

    from depositaja_spark.functions.kmeans import assign_clusters, kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings").persist()
    cents = kmeans_fit(emb, k=8, iterations=3)
    return (
        assign_clusters(emb, cents)
        .groupBy("cluster")
        .agg(FF.count(FF.lit(1)).alias("n_members"))
        .orderBy("cluster")
    )


NO_ORACLE_OK.add("kmeans_cluster_sizes")
