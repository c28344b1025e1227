"""Distributed PageRank: fixed-iteration power method over a DataFrame
edge list, with a generated chained-CTE SQL oracle.

PageRank on an entity graph extracted from fact tables (who-bought-from-
whom, doc-links-doc, user-follows-user) is the canonical iterative
workload an analytics engine must handle without leaving the DataFrame
layer.  The reference engine has no graph surface; this belongs to the
beyond-the-reference scale families alongside connected components
(``functions/graph.py``), and deliberately reuses its iteration
discipline.

Semantics (standard damped PageRank with uniform dangling-mass
redistribution):

    pr'(v) = (1-d)/N + d * ( Σ_{(u,v)∈E} pr(u)/outdeg(u)  +  D/N )

where D = Σ pr(u) over dangling u (no out-edges) and N = |V|.  Ranks
sum to 1 at every iteration (the conservation property the tests pin).

Scale shape:

* **One shuffle per iteration** — the groupBy(dst) contribution
  aggregation; the rank⋈edges join keys on src, and repartitioning the
  (persisted) edge frame by src once lets every iteration's join reuse
  that layout.  Map-side partials compress contributions per partition
  before the exchange.
* **Scalars never touch the driver.**  N and the per-iteration dangling
  mass are 1-row aggregates attached by broadcast cross join — the
  plan-audit-exempt bounded shape — so a 10^10-vertex graph runs the
  same plan as the fixture.
* **Lineage discipline.**  Every round references the previous ranks
  twice (contributions + dangling mass), so a lazy chain DOUBLES its
  plan tree per iteration — 2^k copies of the edge scan in the logical
  plan, megabyte explain strings, Catalyst planning (and the SQL UI's
  retained plan strings) dominating execution.  Each round is therefore
  ``localCheckpoint``-ed (lineage truncated to a leaf) and the PREVIOUS
  round's pinned blocks are retired by the storage-diff pattern shared
  with connected components (``functions/graph.py``); only the final
  round stays pinned for the caller (released by ``release_caches`` /
  the entry wrapper between queries).  On a cluster with preemptible
  executors, swap in reliable ``checkpoint()`` — same shape, durable
  blocks.

The oracle generator emits the SAME fold as k chained CTEs, so DuckDB
replays the exact fixed-point prefix — the strongest check available
for an iterative operator (same approach as ``exact_detector_replay``'s
recursive-CTE oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from depositaja_spark.functions.cache import (
    pinned_rdd_ids,
    track_pinned_rdds,
    tracked_persist,
    unpersist_rdd_ids,
    untrack,
)

__all__ = [
    "hits",
    "hits_oracle_sql",
    "pagerank",
    "pagerank_oracle_sql",
    "personalized_pagerank",
    "personalized_pagerank_oracle_sql",
    "weighted_pagerank",
    "weighted_pagerank_oracle_sql",
]


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over ``edges``; returns ``(id, pr)``.

    Parallel edges count multiplicatively (pass a distinct frame for an
    unweighted graph — the registered query does).  ``pr`` sums to 1.

    Thin wrapper over :func:`weighted_pagerank` with unit weights —
    bit-identical (``pr·1.0 ≡ pr`` and ``Σ1.0 ≡ count``), so ONE copy
    of the fragile persist/localCheckpoint/block-retirement discipline
    serves both shapes."""
    return weighted_pagerank(
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.lit(1).cast("long").alias("w"),
        ),
        iterations=iterations,
        damping=damping,
    )


def pagerank_oracle_sql(
    edges_sql: str, iterations: int = 4, damping: float = 0.85
) -> str:
    """DuckDB SQL computing the identical k-iteration fold.

    ``edges_sql`` must yield columns ``(src, dst)``.  Returns
    ``(id, pr_scaled)`` with pr × N rounded to 6 decimals — O(1)-sized
    values so the fixed rounding keeps real precision at any N.

    Wrapper over :func:`weighted_pagerank_oracle_sql` with unit weights
    (``pr·1 ≡ pr``, ``Σ1 ≡ count`` — value-identical), mirroring the
    engine-side unification."""
    unit = f"SELECT src, dst, 1 AS w FROM ({edges_sql}) unweighted_edges"
    return weighted_pagerank_oracle_sql(unit, iterations=iterations, damping=damping)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "id",
) -> DataFrame:
    """Personalized (topic-sensitive) PageRank: teleport mass goes to the
    ``seeds`` set instead of uniformly to all nodes —

    NOTE on the deliberate duplication with ``pagerank``: standard
    PageRank is exactly this fold with s = uniform, but merging them
    would change float op order ((1-d)/n vs (1-d)·(1/n)) under oracles
    that replay each variant's exact arithmetic — so the two iteration
    bodies stay separate and
    tests/test_pagerank.py:test_standard_pagerank_is_ppr_with_uniform_seeds
    pins their equivalence to 1e-12 as the drift guard.  A fix to either
    iteration's cache/checkpoint discipline must be applied to both.

        pr'(v) = (1-d)·s(v) + d·( Σ contrib(v) + D·s(v) )

    with s(v) = 1/|S| for seeds and 0 otherwise, started from r0 = s.
    Dangling mass D teleports through s too, so ranks sum to 1 every
    round.  This is the relevance/recommendation variant ("rank
    suppliers as seen from German customers"); un-reachable nodes score
    exactly 0, never (1-d)/N.

    Same iteration discipline as ``pagerank`` (one shuffle per round,
    1-row broadcast scalars, per-round localCheckpoint with
    retired-block storage diffs); the seed vector is one extra
    node-keyed frame computed once.  Nodes = edge endpoints ∪ seeds, so
    an isolated seed still holds teleport mass."""
    d = float(damping)
    spark = edges.sparkSession
    sc = spark.sparkContext
    e = tracked_persist(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .repartition("src")
    )
    sd = tracked_persist(seeds.select(F.col(seed_col).alias("id")).distinct())
    nodes = tracked_persist(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .unionByName(sd.select("id"))
        .distinct()
    )
    # (r13) loop-invariant pre-join + dangling set, mirroring
    # weighted_pagerank (see the rationale there); pr/deg arithmetic and
    # the selected dangling pr rows are unchanged
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ej = tracked_persist(e.join(outdeg, "src"))
    dangling_ids = tracked_persist(
        nodes.join(e.select("src"), nodes["id"] == F.col("src"), "left_anti")
    )
    scnt = tracked_persist(sd.agg(F.count(F.lit(1)).cast("double").alias("ns")))
    svec = tracked_persist(
        nodes.join(sd.withColumn("_seed", F.lit(1)), "id", "left_outer")
        .crossJoin(F.broadcast(scnt))
        .select(
            "id",
            F.when(F.col("_seed").isNotNull(), F.lit(1.0) / F.col("ns"))
            .otherwise(F.lit(0.0))
            .alias("s"),
        )
    )
    # materialize every lazy cache BEFORE the first storage snapshot
    # (same ordering rule as pagerank/graph.py); every read of e happens
    # inside these counts, after which e is scaffolding and is retired
    ej.count()
    dangling_ids.count()
    svec.count()
    untrack(e)

    before = pinned_rdd_ids(sc)
    ranks = svec.select("id", F.col("s").alias("pr")).localCheckpoint()
    prev_ids = pinned_rdd_ids(sc) - before

    for _ in range(int(iterations)):
        contrib = (
            ej.join(ranks, ej["src"] == ranks["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("c"))
        )
        dangling = ranks.join(dangling_ids, "id", "left_semi").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m")
        )
        before = pinned_rdd_ids(sc)
        ranks = (
            svec.join(contrib, "id", "left_outer")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - d) * F.col("s")
                    + F.lit(d)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("m") * F.col("s"))
                ).alias("pr"),
            )
            .localCheckpoint()
        )
        unpersist_rdd_ids(sc, prev_ids)
        prev_ids = pinned_rdd_ids(sc) - before
    track_pinned_rdds(sc, prev_ids)
    return ranks


def personalized_pagerank_oracle_sql(
    edges_sql: str, seeds_sql: str, iterations: int = 4, damping: float = 0.85
) -> str:
    """DuckDB SQL replaying the identical personalized fold.  Returns
    ``(id, pr_scaled)`` with pr × N rounded to 6 decimals (same output
    convention as ``pagerank_oracle_sql``)."""
    d = float(damping)
    parts = [
        f"WITH edges AS MATERIALIZED ({edges_sql})",
        f"seeds AS MATERIALIZED (SELECT DISTINCT id FROM ({seeds_sql}))",
        "nodes AS MATERIALIZED (SELECT src AS id FROM edges"
        " UNION SELECT dst FROM edges UNION SELECT id FROM seeds)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM seeds)",
        "outdeg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg"
        " FROM edges GROUP BY src)",
        "svec AS MATERIALIZED (SELECT n.id,"
        " CASE WHEN s.id IS NOT NULL THEN 1.0/ns.ns ELSE 0.0 END AS s"
        " FROM nodes n LEFT JOIN seeds s ON n.id = s.id CROSS JOIN ns)",
        "r0 AS (SELECT id, s AS pr FROM svec)",
    ]
    for i in range(1, int(iterations) + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT v.id,
         (1.0 - {d}) * v.s + {d} * (COALESCE(c.cs, 0.0) + dm.m * v.s) AS pr
  FROM svec v
  CROSS JOIN (SELECT COALESCE(sum(r.pr), 0.0) AS m
              FROM r{i - 1} r LEFT JOIN outdeg o ON r.id = o.src
              WHERE o.src IS NULL) dm
  LEFT JOIN (SELECT e.dst AS id, sum(r.pr / o.deg) AS cs
             FROM edges e
             JOIN r{i - 1} r ON e.src = r.id
             JOIN outdeg o ON e.src = o.src
             GROUP BY e.dst) c ON v.id = c.id)"""
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT id, round(pr * nn.n, 6) AS pr_scaled\n"
        f"FROM r{int(iterations)} CROSS JOIN nn"
    )


# --- HITS (hubs & authorities) over a bipartite edge list ----------------------


def hits(edges: DataFrame, iterations: int = 3):
    """HITS (Kleinberg) hub/authority scores over a bipartite edge frame
    ``(u, p)`` — hubs on the ``u`` side, authorities on ``p`` — run as
    the UN-normalized power method for a fixed number of full rounds:

        a_k(p) = Σ_{(u,p)∈E} h_{k-1}(u)       h_k(u) = Σ_{(u,p)∈E} a_k(p)

    Dropping the per-round normalization changes only the overall scale
    (the classic l1/l2 normalizations rescale both sides uniformly), and
    buys EXACTNESS: with h_0 = 1 every score stays an exact integer,
    carried as DECIMAL(38,0) so nothing rounds or overflows until the
    caller's single final normalization division — bit-stable across
    engines and partitionings with zero float folds (contrast the
    PageRank oracle, which must replay float op order).  Growth bounds
    the round count: scores multiply by ~(avg_deg_u · avg_deg_p) per
    round, so 3 rounds stay far inside 38 digits even at 10^9 edges.

    Scale shape: per round exactly two keyed joins (on u, on p) and two
    keyed aggregations over the persisted edge frame — linear per-key
    fan-out (a node's degree), never a pair self-join, so hub skew costs
    one hot reduce key at worst, which AQE splits.

    Returns ``(auth, hub)`` DataFrames: ``(p, s)`` and ``(u, s)``.
    """
    from depositaja_spark.functions.cache import tracked_persist

    e = tracked_persist(edges.select("u", "p"))
    h = e.select("u").distinct().select(
        "u", F.lit(1).cast("decimal(38,0)").alias("s")
    )
    a = None
    for _ in range(int(iterations)):
        a = (
            e.join(h, "u")
            .groupBy("p")
            .agg(F.sum("s").cast("decimal(38,0)").alias("s"))
        )
        h = (
            e.join(a, "p")
            .groupBy("u")
            .agg(F.sum("s").cast("decimal(38,0)").alias("s"))
        )
    return a, h


def hits_oracle_sql(edges_sql: str, iterations: int = 3) -> str:
    """DuckDB twin of :func:`hits` + the final count-scaled normalization:
    returns (role, id, score) with score = s/Σs × |side|, rounded 6 —
    the only two float ops in the whole computation."""
    ctes = [
        f"e AS MATERIALIZED ({edges_sql})",
        "h0 AS (SELECT DISTINCT u, CAST(1 AS DECIMAL(38,0)) AS s FROM e)",
    ]
    for i in range(1, int(iterations) + 1):
        ctes.append(
            f"a{i} AS (SELECT e.p, CAST(sum(h.s) AS DECIMAL(38,0)) AS s\n"
            f"      FROM e JOIN h{i - 1} h ON e.u = h.u GROUP BY 1)"
        )
        ctes.append(
            f"h{i} AS (SELECT e.u, CAST(sum(a.s) AS DECIMAL(38,0)) AS s\n"
            f"      FROM e JOIN a{i} a ON e.p = a.p GROUP BY 1)"
        )
    k = int(iterations)
    ctes.append(
        f"na AS (SELECT CAST(count(*) AS DOUBLE) AS n,"
        f" CAST(sum(s) AS DOUBLE) AS t FROM a{k})"
    )
    ctes.append(
        f"nh AS (SELECT CAST(count(*) AS DOUBLE) AS n,"
        f" CAST(sum(s) AS DOUBLE) AS t FROM h{k})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT 'auth' AS role, p AS id, round(CAST(s AS DOUBLE) / t * n, 6) AS score
FROM a{k} CROSS JOIN na
UNION ALL
SELECT 'hub' AS role, u AS id, round(CAST(s AS DOUBLE) / t * n, 6) AS score
FROM h{k} CROSS JOIN nh
"""
    )


def weighted_pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """PageRank over a WEIGHTED edge frame ``(src, dst, w)``; returns
    ``(id, pr)`` with contributions proportional to edge weight
    (out-strength normalization).  Semantically the multiset variant of
    :func:`pagerank` with parallel edges pre-aggregated into counts —
    the collapse is the point at scale: a corpus-sized co-occurrence
    multiset becomes a vocabulary²-bounded frame BEFORE the iterations,
    so each power-method round joins the small weighted graph instead
    of re-scanning the corpus (one map-side-combined agg replaces k
    multiset joins).  Same per-round localCheckpoint + block-retirement
    discipline as the unweighted fold.

    Precondition: edge weights must be positive.  Non-positive-weight
    edges are dropped up front — a src whose weights summed to 0 would
    make ``pr*w/deg`` null, and ``F.sum`` silently drops nulls (while a
    SQL oracle divides by zero), so rank mass would leak without error;
    filtering keeps both engines on the same well-defined graph."""
    d = float(damping)
    spark = edges.sparkSession
    sc = spark.sparkContext
    # persist the edges ALREADY hash-partitioned by src: the cached
    # frame's outputPartitioning satisfies every iteration's rank join
    # requirement, so the per-round src-side exchange (the big one — the
    # edge set dwarfs the rank vector) is paid ONCE, and the outdeg
    # groupBy("src") below rides the same layout shuffle-free
    e = tracked_persist(
        edges.select(
            F.col(src_col).alias("src"),
            F.col(dst_col).alias("dst"),
            F.col(w_col).cast("double").alias("w"),
        )
        .filter(F.col("w") > 0)
        .repartition("src")
    )
    nodes = tracked_persist(
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # (r13, guide §2.4) loop-invariant work OUT of the loop: the
    # out-strength join and the dangling-node membership test are both
    # constant across iterations, so pay each ONCE instead of per round.
    #  * ``ej`` carries deg on every edge row — the per-round
    #    e⋈outdeg("src") join (k joins for k iterations) disappears; the
    #    summed expression below stays literally pr*w/deg, so the float
    #    arithmetic the oracle replays is unchanged.
    #  * ``dangling_ids`` (nodes with no out-edge) turns the per-round
    #    node-sized LEFT ANTI against outdeg into a LEFT SEMI against the
    #    usually-far-smaller dangling set (ranks' id set == nodes every
    #    round, so the selected pr rows are identical).
    # Both ride e's hash(src) layout; e itself is released below once the
    # derived caches are materialized, keeping steady-state storage at one
    # edge-sized frame as before.
    outdeg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    ej = tracked_persist(e.join(outdeg, "src"))
    dangling_ids = tracked_persist(
        nodes.join(e.select("src"), nodes["id"] == F.col("src"), "left_anti")
    )
    # N as a 1-row broadcast frame: no collect, no driver scalar
    ncnt = tracked_persist(nodes.agg(F.count(F.lit(1)).cast("double").alias("n")))
    # materialize ALL lazy caches BEFORE the first storage snapshot —
    # persisted frames register their RDD only on first execution, so an
    # unmaterialized cache would first appear DURING round 1's job and
    # the round diff below would mistake it for a round block and retire
    # it mid-algorithm (same ordering rule as graph.py).  ncnt reads
    # through nodes' cache, materializing both; every read of e happens
    # inside these counts, after which e is scaffolding and is retired.
    ej.count()
    dangling_ids.count()
    ncnt.count()
    untrack(e)

    before = pinned_rdd_ids(sc)
    ranks = nodes.crossJoin(F.broadcast(ncnt)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("pr")
    ).localCheckpoint()
    prev_ids = pinned_rdd_ids(sc) - before

    for _ in range(int(iterations)):
        contrib = (
            ej.join(ranks, ej["src"] == ranks["id"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("deg")).alias("c"))
        )
        dangling = ranks.join(dangling_ids, "id", "left_semi").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m")
        )
        # contrib joins FIRST, scalars attach after: putting the cross
        # joins under the left-outer's left child would hoist the 1-row
        # broadcast hints into a build-left position Spark rejects
        # (HintErrorLogger noise, hint dropped)
        before = pinned_rdd_ids(sc)
        ranks = (
            nodes.join(contrib, "id", "left_outer")
            .crossJoin(F.broadcast(ncnt))
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(1.0 - d) / F.col("n")
                    + F.lit(d)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("m") / F.col("n"))
                ).alias("pr"),
            )
            .localCheckpoint()  # eager: truncates lineage, runs the round
        )
        # the new round is materialized; the previous round's blocks are
        # dead — retire them so pinned storage stays O(1) across rounds
        unpersist_rdd_ids(sc, prev_ids)
        prev_ids = pinned_rdd_ids(sc) - before
    # the FINAL round's blocks back the returned frame (localCheckpoint
    # truncated its lineage — unpersisting before the caller reads it
    # would lose the data, not recompute it), so they are handed to the
    # tracked-RDD registry: the caller's normal between-queries
    # release_caches() retires them once the result is consumed
    track_pinned_rdds(sc, prev_ids)
    return ranks


def weighted_pagerank_oracle_sql(
    edges_sql: str, iterations: int = 4, damping: float = 0.85
) -> str:
    """DuckDB twin of :func:`weighted_pagerank`.  ``edges_sql`` must
    yield ``(src, dst, w)``.  Returns ``(id, pr_scaled)``, pr × N
    rounded at 6 — identical to the unweighted oracle's convention.

    Mirrors the engine's up-front ``w > 0`` drop (see the precondition
    note on :func:`weighted_pagerank`) so a non-positive-weight edge
    can never feed the oracle's node set / out-strength / rank flow
    while the Spark side has already dropped it."""
    d = float(damping)
    parts = [
        "WITH edges AS MATERIALIZED ("
        f"SELECT src, dst, w FROM ({edges_sql}) raw_edges WHERE w > 0)",
        "nodes AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "outdeg AS (SELECT src, CAST(sum(w) AS DOUBLE) AS deg"
        " FROM edges GROUP BY src)",
        "r0 AS (SELECT id, 1.0/nn.n AS pr FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, int(iterations) + 1):
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT n.id,
         (1.0 - {d})/nn.n + {d} * (COALESCE(c.s, 0.0) + dm.m/nn.n) AS pr
  FROM nodes n
  CROSS JOIN nn
  CROSS JOIN (SELECT COALESCE(sum(r.pr), 0.0) AS m
              FROM r{i - 1} r LEFT JOIN outdeg o ON r.id = o.src
              WHERE o.src IS NULL) dm
  LEFT JOIN (SELECT e.dst AS id, sum(r.pr * e.w / o.deg) AS s
             FROM edges e
             JOIN r{i - 1} r ON e.src = r.id
             JOIN outdeg o ON e.src = o.src
             GROUP BY e.dst) c ON n.id = c.id)"""
        )
    body = ",\n".join(parts)
    return (
        f"{body}\n"
        f"SELECT id, round(pr * nn.n, 6) AS pr_scaled\n"
        f"FROM r{int(iterations)} CROSS JOIN nn"
    )
