"""ML-adjacent analytics queries: domain classifier + graph ranking.

Two beyond-the-reference families a pretraining-data pipeline needs
(SURVEY.md §6): a closed-form text classifier for quality/domain
filtering (the fastText / CCNet / DSIR recipe) and an iterative graph
rank over entities extracted from fact tables.  Both are fully
oracle-backed — the classifier is plain relational algebra, and the
PageRank oracle replays the identical k-iteration fold as chained CTEs
(``functions/pagerank.py:pagerank_oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from depositaja_spark.functions import classifier as clf
from depositaja_spark.functions import pca
from depositaja_spark.functions import similarity as sim
from depositaja_spark.functions.pagerank import (
    pagerank,
    pagerank_oracle_sql,
    personalized_pagerank,
    personalized_pagerank_oracle_sql,
)
from depositaja_spark.queries_ext import _H64, _TOKS, _docs
from depositaja_spark.registry import NO_ORACLE_OK, query
from depositaja_spark.sources import load_table

# --- domain classifier (NB log-odds) -----------------------------------------
#
# Target domain: a fixed slice of sources standing in for the "trusted"
# corpus (wiki-like in CCNet, the target distribution in DSIR).  The
# classifier is target-vs-rest; its scores drive filtering/reweighting.

_TARGET_SOURCES = ("src1", "src3", "src5", "src7", "src9")
_TGT_SQL = ", ".join(f"'{s}'" for s in _TARGET_SOURCES)

# shared oracle CTE prefix: per-token class counts, normalizers, weights
_CLF_CTES = f"""
toks AS (SELECT doc_id, source, unnest({_TOKS}) AS token FROM documents),
cnt AS (
  SELECT token,
         sum(CASE WHEN source IN ({_TGT_SQL}) THEN 1 ELSE 0 END) AS n_target,
         sum(CASE WHEN source IN ({_TGT_SQL}) THEN 0 ELSE 1 END) AS n_other
  FROM toks GROUP BY token
),
tot AS (SELECT CAST(sum(n_target) AS DOUBLE) AS tp,
               CAST(sum(n_other) AS DOUBLE) AS tn,
               CAST(count(*) AS DOUBLE) AS v
        FROM cnt),
w AS (SELECT token, n_target, n_other,
             ln((n_target + 1.0) / (tp + v)) - ln((n_other + 1.0) / (tn + v))
               AS weight
      FROM cnt CROSS JOIN tot)
"""


def _is_target() -> F.Column:
    return F.col("source").isin(*_TARGET_SOURCES)


@query(
    "domain_classifier_weights",
    f"""
WITH {_CLF_CTES}
SELECT token,
       CAST(n_target AS BIGINT) AS n_target,
       CAST(n_other AS BIGINT) AS n_other,
       round(weight, 6) AS weight
FROM w
""",
)
def q_domain_classifier_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the target-vs-rest NB log-odds weights — one row per
    vocabulary token.  One shuffle (token-keyed, map-side combined);
    output is vocabulary-sized, never corpus-sized; normalizers ride a
    1-row broadcast cross join.  See ``functions/classifier.py``."""
    w = clf.token_log_odds(_docs(spark, sf_dir), _is_target())
    return w.select(
        "token",
        F.col("n_target").cast("long").alias("n_target"),
        F.col("n_other").cast("long").alias("n_other"),
        F.round("weight", 6).alias("weight"),
    )


@query(
    "domain_classifier_scores",
    f"""
WITH {_CLF_CTES},
prior AS (
  SELECT ln(CAST(sum(CASE WHEN source IN ({_TGT_SQL}) THEN 1 ELSE 0 END)
              AS DOUBLE)
            / sum(CASE WHEN source IN ({_TGT_SQL}) THEN 0 ELSE 1 END)) AS p
  FROM documents
),
sums AS (SELECT t.doc_id, sum(w.weight) AS sw
         FROM toks t JOIN w ON t.token = w.token
         GROUP BY t.doc_id),
s AS (SELECT d.doc_id, coalesce(sums.sw, 0) AS sw
      FROM documents d LEFT JOIN sums ON sums.doc_id = d.doc_id)
SELECT doc_id,
       round(sw + p, 6) AS score,
       (sw + p) > 0 AS is_target_pred
FROM s CROSS JOIN prior
""",
)
def q_domain_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document against the trained weights: class-prior
    log-odds plus the sum of its tokens' weights; ``is_target_pred``
    is the sign.  Train and score are ONE lazy plan — the weights
    aggregation feeds the token-keyed scoring join without a driver
    round-trip; AQE decides broadcast-vs-shuffle for the vocabulary
    side at runtime (hard-coding either would be wrong at 100 TB)."""
    docs = _docs(spark, sf_dir)
    w = clf.token_log_odds(docs, _is_target())
    t = _is_target()
    prior = docs.agg(
        F.log(
            F.sum(F.when(t, 1).otherwise(0)).cast("double")
            / F.sum(F.when(t, 0).otherwise(1))
        ).alias("p")
    )
    scored = clf.score_documents(docs, w, prior=prior)
    return scored.select(
        "doc_id", F.round("score", 6).alias("score"), "is_target_pred"
    )


_CAL_TILES = 10


@query(
    "classifier_calibration",
    f"""
WITH {_CLF_CTES},
prior AS (
  SELECT ln(CAST(sum(CASE WHEN source IN ({_TGT_SQL}) THEN 1 ELSE 0 END)
              AS DOUBLE)
            / sum(CASE WHEN source IN ({_TGT_SQL}) THEN 0 ELSE 1 END)) AS p
  FROM documents
),
sums AS (SELECT t.doc_id, sum(w.weight) AS sw
         FROM toks t JOIN w ON t.token = w.token
         GROUP BY t.doc_id),
scored AS (
  SELECT d.doc_id, round(coalesce(sums.sw, 0) + p, 6) AS score,
         CASE WHEN d.source IN ({_TGT_SQL}) THEN 1 ELSE 0 END AS y
  FROM documents d LEFT JOIN sums ON sums.doc_id = d.doc_id
  CROSS JOIN prior
),
tiled AS (
  SELECT doc_id, score, y,
         CAST(ntile({_CAL_TILES}) OVER (ORDER BY score DESC, doc_id) AS INT)
           AS decile
  FROM scored
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(score), 6) AS mean_score,
       round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_target
FROM tiled GROUP BY 1
""",
)
def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the NB domain classifier: documents
    bucketed into score deciles, each decile's mean score next to its
    TRUE target fraction — the calibration table that tells you whether
    a score of 0.9 means 90% (and where to put a filtering threshold).

    The decile assignment uses the exact distributed ntile
    (functions/windows.py:distributed_ntile — quantile-bucketed
    decomposition, no single-task global sort) over the ROUNDED score
    with a doc_id tie-break, so ordering is deterministic and
    engine-identical; per-decile stats are one keyed aggregation."""
    from depositaja_spark.functions.cache import tracked_persist
    from depositaja_spark.functions.windows import distributed_ntile

    docs = _docs(spark, sf_dir)
    w = clf.token_log_odds(docs, _is_target())
    t = _is_target()
    prior = docs.agg(
        F.log(
            F.sum(F.when(t, 1).otherwise(0)).cast("double")
            / F.sum(F.when(t, 0).otherwise(1))
        ).alias("p")
    )
    scored = clf.score_documents(docs, w, prior=prior).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    labels = docs.select("doc_id", F.when(t, 1).otherwise(0).alias("y"))
    frame = tracked_persist(scored.join(labels, "doc_id"))
    n = frame.count()
    tiled = distributed_ntile(frame, "score", "doc_id", _CAL_TILES, n, "decile")
    return (
        tiled.groupBy(F.col("decile").cast("int").alias("decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(
                F.sum("y").cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_target"),
        )
    )


# --- PageRank over the customer→supplier purchase graph ----------------------

_PR_ITERS = 4
_PR_DAMPING = 0.85

_PR_EDGES_SQL = """SELECT DISTINCT 'c:' || o_custkey AS src,
                's:' || l_suppkey AS dst
FROM orders JOIN lineitem ON l_orderkey = o_orderkey"""


@query(
    "supplier_pagerank",
    pagerank_oracle_sql(_PR_EDGES_SQL, iterations=_PR_ITERS, damping=_PR_DAMPING),
)
def q_supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over who-bought-from-whom: directed edges customer →
    supplier from the orders⋈lineitem fact join, 4 damped power-method
    iterations, dangling mass (suppliers have no out-edges)
    redistributed uniformly.  Emits every node's rank scaled by N
    (mean 1.0 — O(1) values survive fixed-decimal rounding at any
    graph size).  One shuffle per iteration; scalars are 1-row
    broadcast frames; ranks persisted per round (see
    ``functions/pagerank.py`` for the ≥10-round checkpoint rule)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # (r13, guide §2.3) DISTINCT on the two LONG keys, then concat the
    # string node ids on the distinct output: the dedup exchange moves
    # 16 bytes/row instead of two strings, and concat runs once per edge
    # instead of once per lineitem.  Same edge set — the 'c:'/'s:'
    # prefixes make the pair→string mapping injective.
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
    )
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING)
    n1 = ranks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return ranks.crossJoin(F.broadcast(n1)).select(
        "id", F.round(F.col("pr") * F.col("n"), 6).alias("pr_scaled")
    )


_PPR_SEED_NATION = "NATION_7"

_PPR_SEEDS_SQL = f"""SELECT 'c:' || c_custkey AS id
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE n_name = '{_PPR_SEED_NATION}'"""


@query(
    "nation_seeded_pagerank",
    personalized_pagerank_oracle_sql(
        _PR_EDGES_SQL, _PPR_SEEDS_SQL, iterations=_PR_ITERS, damping=_PR_DAMPING
    ),
)
def q_nation_seeded_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded on one nation's customers
    over the customer→supplier purchase graph — "which suppliers matter
    as seen from this market segment", the topic-sensitive relevance
    variant.  Teleport and dangling mass go to the seed set only, so
    un-reachable nodes score exactly 0; ranks sum to 1 each round.
    Same per-iteration join economics as supplier_pagerank; the oracle
    replays the identical fold as generated chained CTEs
    (functions/pagerank.py:personalized_pagerank)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    # long-key distinct before concat — see supplier_pagerank
    edges = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
    )
    seeds = (
        cust.join(
            F.broadcast(nat.filter(F.col("n_name") == _PPR_SEED_NATION)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("id"))
    )
    ranks = personalized_pagerank(
        edges, seeds, iterations=_PR_ITERS, damping=_PR_DAMPING
    )
    n1 = ranks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return ranks.crossJoin(F.broadcast(n1)).select(
        "id", F.round(F.col("pr") * F.col("n"), 6).alias("pr_scaled")
    )


# --- triangle counting over the co-purchase graph ----------------------------

_TRI_MIN_SUPPORT = 2

from depositaja_spark.functions.graph import (  # noqa: E402
    copurchase_edges as _copurchase_edges,
    copurchase_edges_sql as _copurchase_edges_sql,
)

#: shared oracle edge set for the whole graph family — capped semantics
#: (MINING_MAX_BASKET) identical to the engine's copurchase_edges()
_TRI_EDGES_SQL = _copurchase_edges_sql(min_support=_TRI_MIN_SUPPORT)


_LPA_ITERATIONS = 4


def _lpa_sql() -> str:
    from depositaja_spark.functions.graph import label_propagation_oracle_sql

    return label_propagation_oracle_sql(
        _TRI_EDGES_SQL, _LPA_ITERATIONS, out_node="part", out_label="community"
    )


@query("copurchase_communities", _lpa_sql())
def q_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities over the part
    co-purchase graph, {_LPA_ITERATIONS} fixed rounds with the
    deterministic most-frequent-neighbor-label rule (ties → smallest
    label) — the community-detection tier of the graph family, distinct
    from connected components (labels compete by FREQUENCY, so dense
    regions keep separate communities inside one component) and from
    PageRank (membership, not importance).
    ``functions/graph.py:label_propagation``; the oracle replays the
    identical rounds as chained CTEs with the row_number twin of the
    engine's min(struct(-n, lbl)) tie-break."""
    from depositaja_spark.functions.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    out = label_propagation(edges, _LPA_ITERATIONS)
    return out.select(F.col("node").alias("part"), F.col("lbl").alias("community"))


@query(
    "copurchase_triangles",
    f"""
WITH e AS ({_TRI_EDGES_SQL})
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.v = e2.u
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
""",
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count of the part co-purchase graph (parts
    co-ordered in ≥ {_TRI_MIN_SUPPORT} orders) — the standard graph
    clustering-coefficient numerator.  Edge generation is the shared
    capped builder (``functions/graph.py:copurchase_edges`` — per-order
    fan-out ≤ MINING_MAX_BASKET² by construction); counting is
    degree-oriented wedge closure
    (``functions/graph.py:triangle_count``) — O(E^1.5) worst-case work,
    hub skew removed by orientation, all keyed shuffles.  The oracle is
    the textbook 3-way canonical-edge self-join — quadratic per hub and
    fine at fixture scale, which is exactly why the engine runs the
    oriented form instead."""
    from depositaja_spark.functions.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    return triangle_count(edges, "u", "v")


# --- fuzzy name matching (edit-distance join) --------------------------------

_FUZZY_K = 2


@query(
    "fuzzy_name_pairs",
    f"""
WITH names AS (SELECT DISTINCT p_name AS s FROM part)
SELECT a.s AS name_a, b.s AS name_b,
       CAST(levenshtein(a.s, b.s) AS INT) AS dist
FROM names a JOIN names b ON a.s < b.s
WHERE levenshtein(a.s, b.s) <= {_FUZZY_K}
""",
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: all part-name pairs within Levenshtein distance
    {_FUZZY_K}, via the filter-then-verify decomposition
    (``functions/fuzzy.py``): distinct values first (each name repeats
    ~30× in the column — verify once, not multiplicity² times), q-gram
    inverted-index candidates for strings long enough for the overlap
    bound, a banded length join for the short tail, exact
    ``levenshtein`` only on the candidate sliver.  The oracle is the
    honest quadratic: all distinct pairs through the DP — the thing the
    engine path exists to avoid."""
    from depositaja_spark.functions.fuzzy import edit_distance_pairs

    part = load_table(spark, sf_dir, "part")
    return edit_distance_pairs(
        part.select(F.col("p_name").alias("s")), "s", max_dist=_FUZZY_K, q=2
    )


# --- k-core of the co-purchase graph -----------------------------------------

_KCORE_K = 3
_KCORE_ORACLE_ROUNDS = 12  # fixture converges in 10; extras are no-ops


@query(
    "copurchase_kcore",
    None,  # assigned below: generated unrolled-peeling SQL
)
def q_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {_KCORE_K}-core of the part co-purchase graph: parts that
    remain after iteratively peeling every part co-ordered with fewer
    than {_KCORE_K} surviving partners — the dense-substructure filter
    (community cores, spam-ring mining).  Engine: per-round degree agg
    + two semi joins, localCheckpoint-truncated lineage with block
    retirement, convergence observed on the round's own action
    (``functions/graph.py:k_core``).  The oracle unrolls the peeling as
    chained CTEs — exact because the fixed point is order-free and
    reached within the unroll depth."""
    from depositaja_spark.functions.graph import k_core

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    return k_core(edges, k=_KCORE_K, max_rounds=20, src_col="u", dst_col="v")


from depositaja_spark.functions.graph import k_core_oracle_sql as _kc_sql  # noqa: E402
from depositaja_spark.registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["copurchase_kcore"] = _kc_sql(
    _TRI_EDGES_SQL, k=_KCORE_K, rounds=_KCORE_ORACLE_ROUNDS
)


# --- PCA over the embedding corpus -------------------------------------------
#
# Two-phase summarize-then-solve (functions/pca.py): distributed d×d
# covariance accumulation, driver-side d×d eigensolve, JVM-side
# generated-SQL projection.  The covariance and per-dim stats are plain
# relational algebra → oracle-backed; the eigensolve has no SQL
# equivalent, so the projection/variance queries are rows-only with a
# numpy-parity pytest (tests/test_pca.py) as their correctness check.

_DIM_STATS_SQL = """
WITH x AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim, embedding
           FROM embeddings),
v AS (SELECT dim, CAST(embedding[dim + 1] AS DOUBLE) AS val FROM x)
SELECT CAST(dim AS INT) AS dim,
       round(avg(val), 6) AS mean,
       round(var_pop(val), 6) AS variance
FROM v GROUP BY dim
"""


@query("embedding_dim_stats", _DIM_STATS_SQL)
def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding corpus — the
    diagnostic that catches dead or exploding dimensions before any
    clustering/ANN work.  One posexplode + one aggregation keyed by the
    (fixed-domain ≤ d) dimension index."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.var_pop("v"), 6).alias("variance"),
        )
    )


_COVARIANCE_SQL = """
WITH x AS (SELECT vec_id, unnest(range(0, len(embedding))) AS i, embedding
           FROM embeddings),
xi AS (SELECT vec_id, i, CAST(embedding[i + 1] AS DOUBLE) AS v FROM x)
SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
       round(covar_pop(a.v, b.v), 6) + 0.0 AS cov
FROM xi a JOIN xi b USING (vec_id)
GROUP BY a.i, b.i
"""


@query("embedding_covariance", _COVARIANCE_SQL)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d×d covariance matrix as a cell frame — PCA phase 1.  The
    Spark side is the SCALE path (per-batch centered numpy Gram inside
    mapInPandas → one (i,j)-keyed sum; shuffle state O(partitions·d²),
    independent of row count); the oracle is the quadratic unnest
    self-join DuckDB can express.  Same numbers, different plans — which
    is the point."""
    emb = load_table(spark, sf_dir, "embeddings")
    # + 0.0 normalizes IEEE −0.0 (a rounding artifact near zero) on both
    # engines so the hash compare can't split on the zero sign
    return pca.covariance_cells(emb).select(
        "i", "j", (F.round("cov", 6) + F.lit(0.0)).alias("cov")
    )


def _pca_projection_sql() -> str:
    from depositaja_spark.functions.pca import pca_project_sql
    from depositaja_spark.functions.pca_artifact import PCA_COMPONENTS, PCA_MEANS

    return pca_project_sql(PCA_MEANS, PCA_COMPONENTS[:2])


@query("embedding_pca_projection", _pca_projection_sql())
def q_embedding_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal-component projection of every embedding — the 2-D
    corpus map, scored with the PINNED model artifact
    (functions/pca_artifact.py: axes fit once at sf0.01 with the repo's
    own distributed ``pca_fit`` and frozen as literals, exactly how a
    production job ships a trained projection).  Pinning makes the
    distributed SCORING operator fully oracle-checkable: the DuckDB twin
    (``pca_project_sql``) evaluates the identical float64 FMA chain over
    the identical literals.  The FIT machinery keeps its own gates —
    ``embedding_covariance`` oracles the distributed Gram phase
    and tests/test_pca.py pins eigensolve parity vs numpy plus the
    artifact's provenance (a re-fit at sf0.01 must reproduce it)."""
    from depositaja_spark.functions.pca_artifact import PCA_COMPONENTS, PCA_MEANS

    emb = load_table(spark, sf_dir, "embeddings")
    return pca.pca_project(emb, PCA_MEANS, PCA_COMPONENTS[:2])


def _pca_variance_sql() -> str:
    from depositaja_spark.functions.pca import projection_terms
    from depositaja_spark.functions.pca_artifact import PCA_COMPONENTS, PCA_MEANS

    s_cols, v_cols = [], []
    for c, comp in enumerate(PCA_COMPONENTS):
        t = projection_terms(PCA_MEANS, comp, one_based=True)
        s_cols.append(f"sum({t}) AS s1_{c}, sum(({t}) * ({t})) AS s2_{c}")
        v_cols.append(
            f"SELECT {c} AS component,"
            f" round((s2_{c} - s1_{c} * s1_{c} / n) / n, 6) AS explained_variance,"
            f" round(((s2_{c} - s1_{c} * s1_{c} / n) / n) / tv, 6) AS variance_ratio"
            f" FROM s CROSS JOIN tv"
        )
    sums = ",\n       ".join(s_cols)
    union = "\nUNION ALL\n".join(v_cols)
    return f"""
WITH s AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
       {sums}
  FROM embeddings
),
e AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings),
pd AS (SELECT dim, sum(v) AS sv, sum(v * v) AS svv FROM e GROUP BY 1),
tv AS (SELECT sum((svv - sv * sv / (SELECT n FROM s)) / (SELECT n FROM s)) AS tv
       FROM pd)
{union}
"""


@query("embedding_pca_variance", _pca_variance_sql())
def q_embedding_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explained variance of the four PINNED principal axes measured ON
    THE DATA (population variance of each axis's projection), plus each
    axis's share of the corpus's total per-dimension variance — the
    'how much of today's corpus do my model's axes still capture'
    drift-style diagnostic.  Every quantity is a moment sum, so both
    engines run the identical (Σp² − (Σp)²/n)/n arithmetic over the
    identical pinned-literal projections; variance is translation-
    invariant but the projections center on the pinned means anyway so
    the two FMA chains stay term-for-term equal.  (Until round 8 this
    query returned the eigensolve's eigenvalues and was rows-only; the
    pinned-artifact reformulation is what makes a full value oracle
    possible.)"""
    from depositaja_spark.functions.pca import projection_terms
    from depositaja_spark.functions.pca_artifact import PCA_COMPONENTS, PCA_MEANS

    emb = load_table(spark, sf_dir, "embeddings")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c, comp in enumerate(PCA_COMPONENTS):
        p = F.expr(projection_terms(PCA_MEANS, comp))
        aggs.append(F.sum(p).alias(f"s1_{c}"))
        aggs.append(F.sum(p * p).alias(f"s2_{c}"))
    s = emb.agg(*aggs)
    per_dim = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .select("dim", F.col("v").cast("double").alias("v"))
        .groupBy("dim")
        .agg(F.sum("v").alias("sv"), F.sum(F.col("v") * F.col("v")).alias("svv"))
    )
    # 1-row scalar broadcast (CARTESIAN_OK pattern): n into the per-dim
    # variance fold, then total variance back beside the moment sums
    tv = (
        per_dim.join(F.broadcast(s.select("n")))
        .select(
            ((F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / F.col("n")).alias("var")
        )
        .agg(F.sum("var").alias("tv"))
    )
    one = s.join(F.broadcast(tv))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("component"),
                F.round(
                    (F.col(f"s2_{c}") - F.col(f"s1_{c}") * F.col(f"s1_{c}") / F.col("n"))
                    / F.col("n"),
                    6,
                ).alias("explained_variance"),
                F.round(
                    (
                        (F.col(f"s2_{c}") - F.col(f"s1_{c}") * F.col(f"s1_{c}") / F.col("n"))
                        / F.col("n")
                    )
                    / F.col("tv"),
                    6,
                ).alias("variance_ratio"),
            )
            for c in range(len(PCA_COMPONENTS))
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        F.col("r.component").cast("int").alias("component"),
        "r.explained_variance",
        "r.variance_ratio",
    )


_LABEL_DRIFT_SQL = """
WITH e AS (SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS dim,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
p AS (SELECT a.vec_id, a.label, a.dim AS i, b.dim AS j, a.v * b.v AS vv
      FROM e a JOIN e b ON a.vec_id = b.vec_id),
nl AS (SELECT label, CAST(count(*) AS DOUBLE) AS n FROM embeddings GROUP BY 1),
na AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings),
mul AS (SELECT e.label, e.dim, sum(e.v) / max(nl.n) AS mu
        FROM e JOIN nl USING (label) GROUP BY e.label, e.dim),
mua AS (SELECT dim, sum(v) / (SELECT n FROM na) AS mu FROM e GROUP BY 1),
graml AS (SELECT p.label, p.i, p.j, sum(p.vv) / max(nl.n) AS g
          FROM p JOIN nl USING (label) GROUP BY p.label, p.i, p.j),
grama AS (SELECT i, j, sum(vv) / (SELECT n FROM na) AS g FROM p GROUP BY 1, 2),
covl AS (SELECT g.label, g.i, g.j, g.g - mi.mu * mj.mu AS c
         FROM graml g
         JOIN mul mi ON mi.label = g.label AND mi.dim = g.i
         JOIN mul mj ON mj.label = g.label AND mj.dim = g.j),
cova AS (SELECT g.i, g.j, g.g - mi.mu * mj.mu AS c
         FROM grama g
         JOIN mua mi ON mi.dim = g.i
         JOIN mua mj ON mj.dim = g.j),
shift AS (SELECT l.label, sqrt(sum((l.mu - a.mu) * (l.mu - a.mu))) AS cs
          FROM mul l JOIN mua a USING (dim) GROUP BY 1),
frob AS (SELECT l.label, sqrt(sum((l.c - a.c) * (l.c - a.c))) AS fd
         FROM covl l JOIN cova a ON a.i = l.i AND a.j = l.j GROUP BY 1)
SELECT nl.label, CAST(nl.n AS BIGINT) AS n,
       round(shift.cs, 6) AS centroid_shift,
       round(frob.fd, 6) AS cov_frobenius
FROM nl JOIN shift USING (label) JOIN frob USING (label)
"""


@query("embedding_label_drift", _LABEL_DRIFT_SQL)
def q_embedding_label_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-SPACE drift per label slice: each label's centroid
    shift (L2 distance from the global centroid) and covariance-shape
    distance (Frobenius norm of cov_label − cov_global) — the
    geometric companion to the token-level KL/JS and value-level PSI
    monitors: token stats can hold steady while a source's embedding
    cloud migrates or collapses, and these two scalars catch exactly
    that.

    Scale shape: ONE distributed pass (functions/pca.py:label_moments —
    per-batch per-label numpy Gram/sum/count partials via mapInPandas)
    aggregates to an L·(1 + d + d²) moment frame, bounded by label
    cardinality × embedding width, never corpus size; the collect and
    the final L-row algebra are driver-side on that bounded summary
    (the kmeans-centroid / codebook pattern).  Global moments are the
    label-sorted sum of per-label moments, so drift math never rescans
    the data.  The oracle recomputes everything from raw unnested
    pairs; both engines share the E[vv^T] − μμ^T formula and round at
    6 (float noise across summation orders is ~1e-12)."""
    import numpy as np

    from depositaja_spark.functions.pca import label_moments

    emb = load_table(spark, sf_dir, "embeddings")
    moment_rows = label_moments(emb).collect()
    d = 1 + max(r["i"] for r in moment_rows if r["kind"] == 1)
    stats: dict[int, tuple[float, np.ndarray, np.ndarray]] = {}
    for lab in {r["label"] for r in moment_rows}:
        stats[lab] = [0.0, np.zeros(d), np.zeros((d, d))]
    for r in moment_rows:
        ent = stats[r["label"]]
        if r["kind"] == 0:
            ent[0] = r["s"]
        elif r["kind"] == 1:
            ent[1][r["i"]] = r["s"]
        else:
            ent[2][r["i"], r["j"]] = r["s"]
    labels = sorted(stats)
    n_g = sum(stats[lab][0] for lab in labels)
    s1_g = np.sum([stats[lab][1] for lab in labels], axis=0)
    s2_g = np.sum([stats[lab][2] for lab in labels], axis=0)
    mu_g = s1_g / n_g
    cov_g = s2_g / n_g - np.outer(mu_g, mu_g)
    out = []
    for lab in labels:
        n_l, s1_l, s2_l = stats[lab]
        mu_l = s1_l / n_l
        cov_l = s2_l / n_l - np.outer(mu_l, mu_l)
        out.append(
            (
                int(lab),
                int(n_l),
                round(float(np.sqrt(((mu_l - mu_g) ** 2).sum())), 6),
                round(float(np.sqrt(((cov_l - cov_g) ** 2).sum())), 6),
            )
        )
    return spark.createDataFrame(
        out, "label int, n bigint, centroid_shift double, cov_frobenius double"
    )


# --- SemDeDup ----------------------------------------------------------------


#: fixture-scaled epsilon (the synthetic embeddings are near-orthogonal,
#: max pairwise cosine ~0.51 — the same scaling embedding_near_dups uses)
_SEMDEDUP_THRESHOLD = 0.4


def _semdedup_sql() -> str:
    from depositaja_spark.functions.kmeans_artifact import KMEANS_CENTROIDS

    rows = ",\n       ".join(
        f"({c}, [{', '.join(repr(float(x)) for x in w)}]::DOUBLE[])"
        for c, w in enumerate(KMEANS_CENTROIDS)
    )
    return f"""
WITH cent(cluster, w) AS (VALUES
       {rows}),
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
        WHERE rn = 1),
u AS (SELECT vec_id,
             list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS unit
      FROM v),
cu AS (SELECT asg.vec_id AS id, asg.cluster, u.unit
       FROM asg JOIN u USING (vec_id)),
dropped AS (SELECT DISTINCT b.id AS vec_id
            FROM cu a JOIN cu b ON a.cluster = b.cluster AND a.id < b.id
            WHERE round(list_inner_product(a.unit, b.unit), 6)
                  >= {_SEMDEDUP_THRESHOLD})
SELECT asg.vec_id, CAST(asg.cluster AS BIGINT) AS cluster,
       (dropped.vec_id IS NULL) AS keep
FROM asg LEFT JOIN dropped USING (vec_id)
"""


@query("semantic_cluster_dedup", _semdedup_sql())
def q_semantic_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means partition, then near-duplicate removal ONLY
    within clusters (functions/similarity.py:semdedup) → per-vector keep
    decision.  Scores against the PINNED clustering model
    (functions/kmeans_artifact.py — centroids fit once at sf0.01 with
    the repo's own distributed Lloyd iteration, frozen as literals),
    which is both how a deployed SemDeDup pass runs (the clustering is
    a versioned artifact, re-fit on a schedule — not per scoring job)
    and what makes the query fully oracle-checkable: assignment argmin
    and the within-cluster cosine sweep are plain SQL over the same
    literals.  (Rows-only through round 7, when the query re-fit the
    clustering per run.)  The FIT keeps its gates: tests/test_kmeans.py
    invariants + the brute-force keep-rule replica and provenance
    re-fit in tests/test_semdedup.py."""
    from depositaja_spark.functions.kmeans_artifact import KMEANS_CENTROIDS

    emb = load_table(spark, sf_dir, "embeddings")
    return sim.semdedup(
        emb, threshold=_SEMDEDUP_THRESHOLD, centroids=KMEANS_CENTROIDS
    )


_SEMDEDUP_SQRT_COS = """
round(
  list_sum(list_transform(range(1, len({a}) + 1),
           i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(range(1, len({a}) + 1),
           i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, len({b}) + 1),
           i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 6)
"""


@query(
    "semdedup_sqrt_cells",
    f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
              WHERE vec_id >= 10
                AND vec_id < 10 + (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
                                   FROM embeddings)),
cell_scores AS (
  SELECT e.vec_id, c.cid,
         {_SEMDEDUP_SQRT_COS.format(a='e.embedding', b='c.cvec')} AS ccos
  FROM embeddings e CROSS JOIN cent c
),
asg AS (
  SELECT vec_id, cid AS cell FROM cell_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1
),
u AS (SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> x / sqrt(list_inner_product(
                                embedding::DOUBLE[], embedding::DOUBLE[]))) AS unit
      FROM embeddings),
cu AS (SELECT asg.vec_id AS id, asg.cell, u.unit
       FROM asg JOIN u USING (vec_id)),
dropped AS (SELECT DISTINCT b.id AS vec_id
            FROM cu a JOIN cu b ON a.cell = b.cell AND a.id < b.id
            WHERE round(list_inner_product(a.unit, b.unit), 6)
                  >= {_SEMDEDUP_THRESHOLD})
SELECT asg.vec_id, asg.cell, (dropped.vec_id IS NULL) AS keep
FROM asg LEFT JOIN dropped USING (vec_id)
""",
)
def q_semdedup_sqrt_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over a √N-cell partition — the registered SCALE PATH for
    the pinned-model `semantic_cluster_dedup` (the r10 full-registry
    sweep's worst ratio: ×19 at 10× data, O(N²/k) at fixed k=8; the
    k∝N discipline restores linearity).  C = ⌈√N⌉ deterministic cells
    (first C corpus rows at id ≥ 10, rounded-cosine assignment with the
    smallest-cid tie-break — the same oracle-replayable convention as
    ann_topk_ivf / hard_negative_pairs_ivf), then semdedup's within-cell
    lower-id cosine ≥ τ drop rule
    (functions/similarity.py:semdedup_sqrt_cells)."""
    return sim.semdedup_sqrt_cells(
        load_table(spark, sf_dir, "embeddings"), threshold=_SEMDEDUP_THRESHOLD
    )


def _q_semdedup_cells2_sql() -> str:
    return f"""
WITH c1n AS (SELECT min(c) AS c1 FROM range(1, 100000) t(c)
             WHERE c*c*c >= (SELECT count(*) FROM embeddings)),
cent1 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
          WHERE vec_id >= 10 AND vec_id < 10 + (SELECT c1 FROM c1n)),
c1_scores AS (
  SELECT e.vec_id, c.cid,
         {_SEMDEDUP_SQRT_COS.format(a='e.embedding', b='c.cvec')} AS ccos
  FROM embeddings e CROSS JOIN cent1 c
),
asg1 AS (
  SELECT vec_id, cid AS cell FROM c1_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1
),
subcent AS (
  SELECT s.cell, e.vec_id AS sub, e.embedding AS svec
  FROM embeddings e JOIN asg1 s ON e.vec_id = s.vec_id
  QUALIFY row_number() OVER (PARTITION BY s.cell ORDER BY e.vec_id)
          <= (SELECT c1 FROM c1n)
),
asg2 AS (
  SELECT e.vec_id, s.cell, sc.sub
  FROM embeddings e
  JOIN asg1 s ON e.vec_id = s.vec_id
  JOIN subcent sc ON sc.cell = s.cell
  QUALIFY row_number() OVER (PARTITION BY e.vec_id
      ORDER BY {_SEMDEDUP_SQRT_COS.format(a='e.embedding', b='sc.svec')} DESC,
               sc.sub) = 1
),
u AS (SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> x / sqrt(list_inner_product(
                                embedding::DOUBLE[], embedding::DOUBLE[]))) AS unit
      FROM embeddings),
cu AS (SELECT asg2.vec_id AS id, asg2.cell, asg2.sub, u.unit
       FROM asg2 JOIN u USING (vec_id)),
dropped AS (SELECT DISTINCT b.id AS vec_id
            FROM cu a JOIN cu b ON a.cell = b.cell AND a.sub = b.sub
                                AND a.id < b.id
            WHERE round(list_inner_product(a.unit, b.unit), 6)
                  >= {_SEMDEDUP_THRESHOLD})
SELECT asg2.vec_id, asg2.cell, asg2.sub, (dropped.vec_id IS NULL) AS keep
FROM asg2 LEFT JOIN dropped USING (vec_id)
"""


@query("semdedup_cells2", _q_semdedup_cells2_sql())
def q_semdedup_cells2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the TWO-LEVEL (cell, sub) quantizer — the r11
    O(N^(4/3)) successor of semdedup_sqrt_cells (O(N^1.5) by design,
    x12 under 10x data at the sf10 decade), sharing the nested
    deterministic quantizer of hard_negative_pairs_ivf2: C1 = smallest
    integer with C1^3 >= N coarse cells, C1 first-members-by-id
    sub-cells each, all assignments rounded-cosine argmax with id
    tie-breaks, replayed level by level in the oracle.  The keep rule
    is semdedup's at (cell, sub) granularity — deeper quantization
    trades recall for the exponent, the standard coarse-to-fine
    progression (functions/similarity.py:semdedup_cells2)."""
    return sim.semdedup_cells2(
        load_table(spark, sf_dir, "embeddings"), threshold=_SEMDEDUP_THRESHOLD
    )



# --- DSIR: hashed n-gram importance weights ----------------------------------
#
# Data Selection via Importance Resampling (Xie et al. 2023): estimate
# target and raw distributions over B hashed n-gram buckets, weight each
# document by its log importance ratio Σ_b c_b(x)·ln(p̂_t(b)/p̂_r(b)).
# The fastText-classifier alternative above learns a discriminator; DSIR
# is the generative twin — both are one-shuffle relational plans.  B is
# the scale lever: the bucket-count frame is B rows whatever the corpus.

_DSIR_B = 256  # hash buckets (paper: 10^4; scaled to the fixture vocab)
_DSIR_A = 1.0  # additive smoothing

#: unigram+bigram rows per doc, multiplicity preserved (DSIR counts
#: occurrences, not presence).  Guarded transform: sequence(1, 0) would
#: count DOWN for 1-token docs.
_FEATS_SQL = f"""
tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT doc_id, unnest(toks) AS g FROM tk),
bii AS (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks FROM tk),
bi AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS g FROM bii),
feat AS (
  SELECT doc_id, {_H64.format(x='g')} % {_DSIR_B} AS bucket FROM uni
  UNION ALL
  SELECT doc_id, {_H64.format(x='g')} % {_DSIR_B} AS bucket FROM bi
)
"""

_DSIR_SQL = f"""
WITH {_FEATS_SQL},
lab AS (SELECT doc_id, source IN ({_TGT_SQL}) AS is_t FROM documents),
cnt AS (
  SELECT bucket,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt,
         sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS nr
  FROM feat JOIN lab USING (doc_id) GROUP BY bucket
),
tot AS (SELECT CAST(sum(nt) AS DOUBLE) AS tt, CAST(sum(nr) AS DOUBLE) AS tr
        FROM cnt),
lr AS (
  SELECT bucket,
         ln((nt + {_DSIR_A}) / (tt + {_DSIR_A} * {_DSIR_B}))
           - ln((nr + {_DSIR_A}) / (tr + {_DSIR_A} * {_DSIR_B})) AS lr
  FROM cnt CROSS JOIN tot
)
SELECT feat.doc_id, round(sum(lr.lr), 6) AS logw
FROM feat JOIN lr USING (bucket)
GROUP BY feat.doc_id
"""


def _hashed_feature_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket): hashed unigram+bigram features, multiplicity
    preserved — built array-side in one codegen stage like
    functions/spans.py's positional grams."""
    from depositaja_spark.functions.text import hash64

    from depositaja_spark.functions.text import tokens

    tk = docs.select("doc_id", tokens("text").alias("toks"))
    grams = F.expr(
        "concat(toks, CASE WHEN size(toks) >= 2 THEN "
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
        "ELSE array() END)"
    )
    return tk.select(
        "doc_id", F.explode(grams).alias("g")
    ).select("doc_id", (hash64(F.col("g")) % _DSIR_B).alias("bucket"))


@query("dsir_importance_weights", _DSIR_SQL)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR log importance weight against the target-source
    slice.  Plan: one feature explode (array-side grams), one
    bucket-keyed count aggregation (output ≤ B rows however big the
    corpus), 1-row broadcast totals, then the scoring join — the B-row
    log-ratio side is left to AQE (it will broadcast), and the final
    doc aggregation is the only corpus-sized shuffle."""
    from depositaja_spark.functions.cache import tracked_persist

    docs = _docs(spark, sf_dir)
    # persisted: feat feeds the bucket-count aggregation AND the scoring
    # join — without the pin Catalyst re-explodes the corpus per branch
    feat = tracked_persist(_hashed_feature_buckets(docs))
    lab = docs.select("doc_id", _is_target().alias("is_t"))
    cnt = (
        feat.join(lab, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("nt"),
            F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("nr"),
        )
    )
    tot = cnt.agg(
        F.sum("nt").cast("double").alias("tt"), F.sum("nr").cast("double").alias("tr")
    )
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("nt") + _DSIR_A) / (F.col("tt") + _DSIR_A * _DSIR_B))
            - F.log((F.col("nr") + _DSIR_A) / (F.col("tr") + _DSIR_A * _DSIR_B))
        ).alias("lr"),
    )
    return (
        feat.join(lr, "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lr"), 6).alias("logw"))
    )


@query(
    "dsir_top_docs",
    f"""
WITH w AS ({_DSIR_SQL})
SELECT doc_id, logw FROM w ORDER BY logw DESC, doc_id LIMIT 50
""",
)
def q_dsir_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR selection: top-50 documents by importance weight
    (deterministic doc_id tie-break) — TakeOrderedAndProject, the
    global-sort-free top-k."""
    return (
        q_dsir_importance_weights(spark, sf_dir)
        .orderBy(F.desc("logw"), F.asc("doc_id"))
        .limit(50)
    )


# --- link prediction over the co-purchase graph --------------------------------

#: wedge-center degree cap: a super-hub neighbor (a part in half the
#: orders) contributes deg² wedge pairs while adding ~1/deg ≈ 0 to every
#: resource-allocation score — the same skew class MINING_MAX_BASKET
#: kills in the basket self-joins, applied here to the common-neighbor
#: join.  Fixture degrees stay far below the cap (asserted in tests, so
#: the oracle semantics are cap-invariant there); a planted hub test
#: exercises the exclusion path.
LINKPRED_MAX_DEG = 128

#: fixed-point scale for the exact resource-allocation accumulation:
#: Σ 1/deg(z) is summed as Σ floor(10¹²/deg(z)) in integer arithmetic
#: (order-independent, cross-engine exact) and divided back ONCE.
_RA_SCALE = 1_000_000_000_000


@query(
    "copurchase_link_prediction",
    f"""
WITH e AS ({_TRI_EDGES_SQL}),
und AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        FROM und GROUP BY 1),
ctr AS (SELECT node, deg FROM deg WHERE deg <= {LINKPRED_MAX_DEG}),
wed AS (
  SELECT a.dst AS x, b.dst AS y, c.deg
  FROM und a
  JOIN und b ON a.src = b.src AND a.dst < b.dst
  JOIN ctr c ON c.node = a.src
), grp AS (
  SELECT x, y, CAST(count(*) AS BIGINT) AS common_neighbors,
         sum({_RA_SCALE} // deg) AS ras
  FROM wed GROUP BY 1, 2
), cand AS (
  SELECT g.* FROM grp g
  ANTI JOIN e ON g.x = e.u AND g.y = e.v
)
SELECT x AS part_a, y AS part_b, common_neighbors,
       round(CAST(ras AS DOUBLE) / 1e12, 6) AS ra_score
FROM cand
ORDER BY common_neighbors DESC, ras DESC, x ASC, y ASC
LIMIT 20
""",
)
def q_copurchase_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the part co-purchase graph: the top 20
    NON-adjacent part pairs by common-neighbor count, tie-ranked by the
    resource-allocation index Σ_z 1/deg(z) (Zhou–Lü–Zhang) — the
    'customers who bought these also bought' candidate generator.  The
    wedge join through each common neighbor z is the only quadratic
    term and is bounded two ways: deg(z) ≤ {LINKPRED_MAX_DEG} excludes
    super-hubs (their 1/deg contribution is noise, their deg² fan-out
    is the skew; see LINKPRED_MAX_DEG) and the co-purchase edge set is
    already support-filtered.  The RA sum accumulates as exact integers
    (floor(10¹²/deg), one float division at output), so the ranking is
    order-independent and cross-engine exact; the top-20 carries a full
    (cn, ras, x, y) tie-break and plans as TakeOrderedAndProject.
    Existing edges are removed by a left-anti join — predictions are by
    definition pairs the graph does NOT already contain."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    und = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    ctr = deg.filter(F.col("deg") <= LINKPRED_MAX_DEG)
    wed = (
        und.select("src", F.col("dst").alias("x"))
        .join(und.select("src", F.col("dst").alias("y")), "src")
        .filter(F.col("x") < F.col("y"))
        .join(ctr, "src")
    )
    grp = wed.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum(
            F.expr(f"{_RA_SCALE} div deg").cast("decimal(38,0)")
        ).alias("ras"),
    )
    cand = grp.join(
        edges, (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")), "left_anti"
    )
    return (
        cand.orderBy(
            F.col("common_neighbors").desc(),
            F.col("ras").desc(),
            F.col("x").asc(),
            F.col("y").asc(),
        )
        .limit(20)
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            "common_neighbors",
            F.round(F.col("ras").cast("double") / 1e12, 6).alias("ra_score"),
        )
    )


# --- decision stump (CART split) ------------------------------------------------


@query(
    "gini_split_stump",
    """
WITH ev AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
  FROM events WHERE value IS NOT NULL
), hist AS (
  SELECT v, CAST(sum(p) AS BIGINT) AS np, CAST(count(*) AS BIGINT) AS nc
  FROM ev GROUP BY v
), cum AS (
  SELECT v,
         CAST(sum(np) OVER (ORDER BY v) AS BIGINT) AS npl,
         CAST(sum(nc) OVER (ORDER BY v) AS BIGINT) AS nl
  FROM hist
), tot AS (
  SELECT CAST(sum(p) AS BIGINT) AS tp, CAST(count(*) AS BIGINT) AS tn FROM ev
), cand AS (
  SELECT v, npl, nl, tp, tn,
         CAST(npl AS DOUBLE) AS npl_d, CAST(nl AS DOUBLE) AS nl_d,
         CAST(tp - npl AS DOUBLE) AS npr_d, CAST(tn - nl AS DOUBLE) AS nr_d,
         CAST(tp AS DOUBLE) AS tp_d, CAST(tn AS DOUBLE) AS tn_d
  FROM cum CROSS JOIN tot WHERE nl < tn
), sc AS (
  SELECT *,
         (npl_d * npl_d + (nl_d - npl_d) * (nl_d - npl_d)) / nl_d
         + (npr_d * npr_d + (nr_d - npr_d) * (nr_d - npr_d)) / nr_d AS s
  FROM cand
), best AS (
  SELECT * FROM sc ORDER BY s DESC, v ASC LIMIT 1
)
SELECT CAST(v AS DOUBLE) AS threshold,
       nl AS n_left, npl AS n_purchase_left,
       CAST(tn - nl AS BIGINT) AS n_right,
       CAST(tp - npl AS BIGINT) AS n_purchase_right,
       round(s / tn_d
             - (tp_d * tp_d + (tn_d - tp_d) * (tn_d - tp_d)) / (tn_d * tn_d),
             6) AS gini_gain
FROM best
""",
)
def q_gini_split_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal CART decision stump on event value for the
    purchase-vs-rest label: the single threshold t maximizing Gini
    impurity decrease over 'value ≤ t | value > t' — the exact
    best-first-split a distributed tree learner computes, and the
    feature-screening primitive (a near-zero best gain says the column
    can't separate the label).  Every candidate threshold is a distinct
    2-decimal value, so the search space is the DOMAIN-bounded
    histogram (≤ ~10⁵ rows at any volume): one corpus scan → keyed agg,
    cumulative class counts via the window ABOVE that aggregate,
    totals as a 1-row broadcast, then the impurity score as a
    fixed-op-order float expression per candidate (counts are exact
    integers; maximizing Σ_side Σ_c c²/n_side ≡ minimizing weighted
    Gini) and a TakeOrdered(1) argmax with the v-ascending tie-break.
    No Python, no iteration, no unbounded shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    from depositaja_spark.functions.numeric import dec

    arms = ev.select(
        dec("value").alias("v"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("p"),
    )
    hist = arms.groupBy("v").agg(
        F.sum("p").cast("long").alias("np"),
        F.count(F.lit(1)).cast("long").alias("nc"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    cum = hist.select(
        "v",
        F.sum("np").over(w).cast("long").alias("npl"),
        F.sum("nc").over(w).cast("long").alias("nl"),
    )
    tot = arms.agg(
        F.sum("p").cast("long").alias("tp"),
        F.count(F.lit(1)).cast("long").alias("tn"),
    )
    # 1-row broadcast scalar join (CARTESIAN_OK): the class totals.
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("tn"))
        .select(
            "v",
            "npl",
            "nl",
            "tp",
            "tn",
            F.col("npl").cast("double").alias("npl_d"),
            F.col("nl").cast("double").alias("nl_d"),
            (F.col("tp") - F.col("npl")).cast("double").alias("npr_d"),
            (F.col("tn") - F.col("nl")).cast("double").alias("nr_d"),
            F.col("tp").cast("double").alias("tp_d"),
            F.col("tn").cast("double").alias("tn_d"),
        )
    )
    npl_d, nl_d = F.col("npl_d"), F.col("nl_d")
    npr_d, nr_d = F.col("npr_d"), F.col("nr_d")
    sc = cand.withColumn(
        "s",
        (npl_d * npl_d + (nl_d - npl_d) * (nl_d - npl_d)) / nl_d
        + (npr_d * npr_d + (nr_d - npr_d) * (nr_d - npr_d)) / nr_d,
    )
    best = sc.orderBy(F.col("s").desc(), F.col("v").asc()).limit(1)
    tp_d, tn_d = F.col("tp_d"), F.col("tn_d")
    return best.select(
        F.col("v").cast("double").alias("threshold"),
        F.col("nl").alias("n_left"),
        F.col("npl").alias("n_purchase_left"),
        (F.col("tn") - F.col("nl")).cast("long").alias("n_right"),
        (F.col("tp") - F.col("npl")).cast("long").alias("n_purchase_right"),
        F.round(
            F.col("s") / tn_d
            - (tp_d * tp_d + (tn_d - tp_d) * (tn_d - tp_d)) / (tn_d * tn_d),
            6,
        ).alias("gini_gain"),
    )


@query(
    "classifier_auc",
    f"""
WITH {_CLF_CTES},
prior AS (
  SELECT ln(CAST(sum(CASE WHEN source IN ({_TGT_SQL}) THEN 1 ELSE 0 END)
              AS DOUBLE)
            / sum(CASE WHEN source IN ({_TGT_SQL}) THEN 0 ELSE 1 END)) AS p
  FROM documents
),
sums AS (SELECT t.doc_id, sum(w.weight) AS sw
         FROM toks t JOIN w ON t.token = w.token
         GROUP BY t.doc_id),
scored AS (
  SELECT d.doc_id, round(coalesce(sums.sw, 0) + p, 6) AS score,
         CASE WHEN d.source IN ({_TGT_SQL}) THEN 1 ELSE 0 END AS y
  FROM documents d LEFT JOIN sums ON sums.doc_id = d.doc_id
  CROSS JOIN prior
),
r AS (
  SELECT score, y,
         row_number() OVER (ORDER BY score, doc_id) AS rn
  FROM scored
),
g AS (
  SELECT score, CAST(sum(y) AS BIGINT) AS c1,
         CAST(count(*) AS BIGINT) AS t,
         CAST(min(rn) + max(rn) AS BIGINT) AS mm
  FROM r GROUP BY score
),
agg AS (
  SELECT CAST(sum(CAST(c1 AS HUGEINT) * mm) AS HUGEINT) AS r1x2,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(t - c1) AS BIGINT) AS n2
  FROM g
)
SELECT n1 AS n_target, n2 AS n_rest,
       round(CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS auc,
       round(CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) - 1, 6) AS somers_d
FROM agg WHERE n1 > 0 AND n2 > 0
""",
)
def q_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC (+ Somers' D = 2·AUC−1) of the NB domain classifier
    against its own source labels — the threshold-free eval that
    completes the classifier suite (calibration says whether 0.9 MEANS
    90%; AUC says how well the score ORDERS target above rest, i.e.
    P(score_target > score_rest) with ½ credit for ties).  Midranks
    stay exact: global ranks come from the grouped-bucket rank
    decomposition (functions/windows.py — quantile value buckets, no
    single-task sort over the sf-scaling score frame), and per-score
    min(rank)+max(rank) IS the doubled midrank since tie ranks are
    consecutive integers; Σc₁·2r̄ accumulates in DECIMAL(38,0)/HUGEINT
    and TWO float divisions finish AUC and D.  Scores are the same
    round-6 log-odds the calibration query ships."""
    from depositaja_spark.functions.cache import tracked_persist
    from depositaja_spark.functions.windows import grouped_ntile_cume

    docs = _docs(spark, sf_dir)
    w = clf.token_log_odds(docs, _is_target())
    t = _is_target()
    prior = docs.agg(
        F.log(
            F.sum(F.when(t, 1).otherwise(0)).cast("double")
            / F.sum(F.when(t, 0).otherwise(1))
        ).alias("p")
    )
    scored = clf.score_documents(docs, w, prior=prior).select(
        "doc_id", F.round("score", 6).alias("score")
    )
    labels = docs.select("doc_id", F.when(t, 1).otherwise(0).alias("y"))
    frame = tracked_persist(
        scored.join(labels, "doc_id").withColumn("_g", F.lit(1))
    )
    ranked = grouped_ntile_cume(
        frame, part_col="_g", value_col="score", tiebreak_col="doc_id",
        n_tiles=4, rank_col="_r",
    )
    g = ranked.groupBy("score").agg(
        F.sum("y").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("t"),
        (F.min("_r") + F.max("_r")).cast("long").alias("mm"),
    )
    agg = g.agg(
        F.sum(F.col("c1").cast("decimal(38,0)") * F.col("mm")).alias("r1x2"),
        F.sum("c1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("c1")).cast("long").alias("n2"),
    )
    u1x2 = (
        F.col("r1x2") - F.col("n1").cast("decimal(38,0)") * (F.col("n1") + 1)
    ).cast("double")
    n12 = F.col("n1").cast("double") * F.col("n2").cast("double")
    return agg.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        F.col("n1").alias("n_target"),
        F.col("n2").alias("n_rest"),
        F.round(u1x2 / 2 / n12, 6).alias("auc"),
        F.round(u1x2 / n12 - 1, 6).alias("somers_d"),
    )


# --- Brier score + Murphy decomposition ---------------------------------------

#: the decomposition conditions on the DISTINCT forecast value (integer
#: cents, ≤101 bins) — Murphy's original partition, under which
#: Brier = REL − RES + UNC holds EXACTLY (coarse binning adds
#: within-bin variance/covariance residuals)
_BRIER_BINS = 101

#: salt for the deterministic pseudo-score (the metric plumbing is the
#: operator under test; a trained model's score column drops in here)
_BRIER_SALT = "brier:"


@query(
    "brier_decomposition",
    f"""
WITH sc AS (
  SELECT CAST({_H64.format(x=f"'{_BRIER_SALT}' || CAST(event_id AS VARCHAR)")}
              % 101 AS BIGINT) AS p_cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
b AS (
  SELECT p_cents AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(p_cents) AS BIGINT) AS p_sum,
         CAST(sum(y) AS BIGINT) AS y_sum,
         CAST(sum((p_cents - 100 * y) * (p_cents - 100 * y)) AS BIGINT) AS sq
  FROM sc GROUP BY 1
),
tot AS (SELECT CAST(sum(n_b) AS BIGINT) AS n, CAST(sum(y_sum) AS BIGINT) AS yy,
               CAST(sum(sq) AS BIGINT) AS sqt
        FROM b),
terms AS (
  SELECT bin,
         CAST(CAST(p_sum - 100 * y_sum AS DECIMAL(38,0))
              * CAST(p_sum - 100 * y_sum AS DECIMAL(38,0)) AS DOUBLE)
           / (n_b * 10000.0) AS rel_t,
         CAST((CAST(y_sum AS DECIMAL(38,0)) * n - CAST(yy AS DECIMAL(38,0)) * n_b)
              * (CAST(y_sum AS DECIMAL(38,0)) * n - CAST(yy AS DECIMAL(38,0)) * n_b)
              AS DOUBLE)
           / (CAST(n_b AS DOUBLE) * n * n) AS res_t
  FROM b CROSS JOIN tot
),
runs AS (
  SELECT sum(rel_t) OVER (ORDER BY bin) AS rel_run,
         sum(res_t) OVER (ORDER BY bin) AS res_run,
         row_number() OVER (ORDER BY bin) AS rn,
         count(*) OVER () AS nb
  FROM terms
)
SELECT tot.n AS n_events,
       round(CAST(tot.sqt AS DOUBLE) / (tot.n * 10000.0), 6) AS brier,
       round(runs.rel_run / tot.n, 6) AS reliability,
       round(runs.res_run / tot.n, 6) AS resolution,
       round(CAST(CAST(tot.yy AS DECIMAL(38,0)) * (tot.n - tot.yy) AS DOUBLE)
             / (CAST(tot.n AS DOUBLE) * tot.n), 6) AS uncertainty
FROM runs CROSS JOIN tot WHERE runs.rn = runs.nb
""",
)
def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the Murphy reliability / resolution /
    uncertainty decomposition over a probabilistic classifier's scores
    — the calibration audit that says WHY a probability model is good
    or bad (well-calibrated but uninformative vs sharp but biased).
    The score column is a deterministic hash-derived pseudo-probability
    in integer CENTS (a trained model's scores drop into the same
    plumbing); the outcome is the purchase indicator.  The partition is
    Murphy's original — condition on each DISTINCT forecast value — so
    the identity Brier = REL − RES + UNC holds exactly (verified to
    float tolerance in tests/test_eval_metrics.py; coarse reliability-
    diagram binning would add within-bin residual terms).  Every moment
    is integer-exact — per-value (n_b, Σp, Σy, Σ(p−100y)²) from one
    keyed agg, the decomposition terms' numerators are exact DECIMAL
    squares — and the ≤{_BRIER_BINS} per-value float terms fold through
    an ORDERED window sum, so both engines add in the same order.
    Scale shape: one corpus scan + one ≤{_BRIER_BINS}-row value frame;
    the totals are a 1-row broadcast."""
    from pyspark.sql import Window as W

    from depositaja_spark.functions.text import hash64

    ev = load_table(spark, sf_dir, "events")
    sc = ev.select(
        (
            hash64(F.concat(F.lit(_BRIER_SALT), F.col("event_id").cast("string")))
            % 101
        ).alias("p_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    diff = F.col("p_cents") - 100 * F.col("y")
    b = sc.groupBy(
        F.col("p_cents").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("p_cents").cast("long").alias("p_sum"),
        F.sum("y").cast("long").alias("y_sum"),
        F.sum(diff * diff).cast("long").alias("sq"),
    )
    tot = b.agg(
        F.sum("n_b").cast("long").alias("n"),
        F.sum("y_sum").cast("long").alias("yy"),
        F.sum("sq").cast("long").alias("sqt"),
    )
    rel_num = (F.col("p_sum") - 100 * F.col("y_sum")).cast("decimal(38,0)")
    res_num = (
        F.col("y_sum").cast("decimal(38,0)") * F.col("n")
        - F.col("yy").cast("decimal(38,0)") * F.col("n_b")
    )
    terms = b.crossJoin(F.broadcast(tot)).select(
        "bin",
        ((rel_num * rel_num).cast("double") / (F.col("n_b") * 10000.0)).alias(
            "rel_t"
        ),
        (
            (res_num * res_num).cast("double")
            / (F.col("n_b").cast("double") * F.col("n") * F.col("n"))
        ).alias("res_t"),
    )
    w_run = W.partitionBy().orderBy("bin").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy()
    runs = terms.select(
        F.sum("rel_t").over(w_run).alias("rel_run"),
        F.sum("res_t").over(w_run).alias("res_run"),
        F.row_number().over(W.partitionBy().orderBy("bin")).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("nb"),
    )
    return (
        runs.filter(F.col("rn") == F.col("nb"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n").alias("n_events"),
            F.round(F.col("sqt").cast("double") / (F.col("n") * 10000.0), 6).alias(
                "brier"
            ),
            F.round(F.col("rel_run") / F.col("n"), 6).alias("reliability"),
            F.round(F.col("res_run") / F.col("n"), 6).alias("resolution"),
            F.round(
                (
                    F.col("yy").cast("decimal(38,0)")
                    * (F.col("n") - F.col("yy"))
                ).cast("double")
                / (F.col("n").cast("double") * F.col("n")),
                6,
            ).alias("uncertainty"),
        )
    )


# --- BFS hop layers + degree CCDF over the co-purchase graph ------------------

_BFS_MAX_HOPS = 6

from depositaja_spark.functions.graph import bfs_oracle_sql as _bfs_sql  # noqa: E402


@query(
    "copurchase_bfs_hops",
    _bfs_sql(
        _TRI_EDGES_SQL,
        "SELECT min(u) AS node FROM e WHERE u IS NOT NULL",
        _BFS_MAX_HOPS,
        out_node="part",
    ),
)
def q_copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shortest-path hop distance from the lowest-id part to every
    part reachable within {_BFS_MAX_HOPS} hops of the co-purchase graph
    — the related-item expansion tiers ('bought together' at distance
    1, 'same aisle' at 2-3) and the blast-radius primitive.
    ``functions/graph.py:bfs_hops``: per round one keyed frontier join
    + distinct + anti join against the visited set, O(1) pinned blocks
    across rounds; bounded-round contract makes the chained-CTE oracle
    exact (same shape as label propagation / k-core).  Edges come from
    the shared capped builder."""
    from depositaja_spark.functions.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    seeds = edges.agg(F.min("u").alias("node")).filter(
        F.col("node").isNotNull()
    )
    out = bfs_hops(edges, seeds, max_hops=_BFS_MAX_HOPS)
    return out.select(
        F.col("node").alias("part"), F.col("hop").cast("int").alias("hops")
    )


# --- weighted single-source shortest paths -----------------------------------

_SSSP_ROUNDS = 5


def _sssp_sql() -> str:
    from depositaja_spark.functions.graph import sssp_oracle_sql

    weighted = (
        "SELECT u, v, greatest(1, 1000 // support) AS w FROM ("
        + _copurchase_edges_sql(min_support=_TRI_MIN_SUPPORT, keep_support=True)
        + ") se"
    )
    return sssp_oracle_sql(
        weighted,
        "SELECT min(u) AS node FROM e WHERE u IS NOT NULL",
        _SSSP_ROUNDS,
        out_node="part",
    )


@query("copurchase_weighted_sssp", _sssp_sql())
def q_copurchase_weighted_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest-path distance from the lowest-id part over the
    co-purchase graph, edge cost = greatest(1, 1000 div support) —
    strong co-purchases are short hops, so the distance ranks parts by
    association strength along the best path, not just hop count (the
    'related products' radius with affinity-weighted tiers).
    5 synchronous Bellman-Ford rounds
    (``functions/graph.py:weighted_sssp``): per round one keyed
    dist⋈edges join + one min-agg, localCheckpoint-ed with block
    retirement; INTEGER weights keep every distance exact on both
    engines, and the bounded-round contract makes the chained-CTE
    oracle an identical replay."""
    from depositaja_spark.functions.graph import weighted_sssp

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(
        li, min_support=_TRI_MIN_SUPPORT, keep_support=True
    ).withColumn("w", F.greatest(F.lit(1).cast("long"), F.expr("1000 div support")))
    seeds = edges.agg(F.min("u").alias("node")).filter(F.col("node").isNotNull())
    out = weighted_sssp(edges, seeds, rounds=_SSSP_ROUNDS)
    return out.select(F.col("node").alias("part"), F.col("dist").cast("long").alias("dist"))


@query(
    "copurchase_degree_ccdf",
    f"""
WITH e AS ({_TRI_EDGES_SQL}),
und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1),
h AS (SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1)
SELECT CAST(deg AS BIGINT) AS degree, n_nodes,
       CAST(sum(n_nodes) OVER (ORDER BY deg DESC) AS BIGINT) AS n_nodes_ge
FROM h
""",
)
def q_copurchase_degree_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph as an exact CCDF
    (per distinct degree: node count and nodes-with-degree-≥) — the
    heavy-tail diagnostic read before choosing hub caps
    (LINKPRED_MAX_DEG, MINING_MAX_BASKET): where the tail bends is
    where the caps belong.  All integer arithmetic; the cumulative runs
    over the ≤|distinct degrees| histogram frame, never per node."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    und = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    h = deg.groupBy("deg").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    w = (
        W.partitionBy()
        .orderBy(F.col("deg").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return h.select(
        F.col("deg").cast("long").alias("degree"),
        "n_nodes",
        F.sum("n_nodes").over(w).cast("long").alias("n_nodes_ge"),
    )


# --- reliability (calibration) curve ------------------------------------------


@query(
    "calibration_curve",
    f"""
WITH sc AS (
  SELECT CAST({_H64.format(x=f"'{_BRIER_SALT}' || CAST(event_id AS VARCHAR)")}
              % 101 AS BIGINT) AS p_cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
)
SELECT CAST(least(p_cents // 10, 9) AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(p_cents) AS DOUBLE) / (count(*) * 100), 6) AS avg_pred,
       round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS frac_pos
FROM sc GROUP BY 1
""",
)
def q_calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reliability diagram behind brier_decomposition: per score
    decile, mean predicted probability vs observed positive rate — the
    table you plot to SEE miscalibration (the decomposition scores it).
    Same deterministic integer-cents pseudo-score (a model's score
    column drops in); one keyed agg with exact integer sums, two float
    divisions per bin, 10-row output forever."""
    from depositaja_spark.functions.text import hash64

    ev = load_table(spark, sf_dir, "events")
    sc = ev.select(
        (
            hash64(F.concat(F.lit(_BRIER_SALT), F.col("event_id").cast("string")))
            % 101
        ).alias("p_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    return sc.groupBy(
        F.least(F.floor(F.col("p_cents") / 10), F.lit(9))
        .cast("int")
        .alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum("p_cents").cast("double") / (F.count(F.lit(1)) * 100), 6
        ).alias("avg_pred"),
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias(
            "frac_pos"
        ),
    )


# --- token-pair PMI over the top-V vocabulary ---------------------------------

_PMI_V = 32
_PMI_MIN_CO = 5


@query(
    "token_pmi_topv",
    f"""
WITH tk AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents),
nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
topv AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df
  FROM tk GROUP BY 1
  ORDER BY df DESC, tok ASC LIMIT {_PMI_V}
),
pres AS (SELECT tk.doc_id, tk.tok, topv.df FROM tk JOIN topv USING (tok)),
pair AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b,
         max(a.df) AS dfa, max(b.df) AS dfb,
         CAST(count(*) AS BIGINT) AS co
  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
)
SELECT tok_a, tok_b, dfa AS df_a, dfb AS df_b, co,
       round(ln(CAST(co AS DOUBLE) * nn.n / (CAST(dfa AS DOUBLE) * dfb)), 6)
         AS pmi
FROM pair CROSS JOIN nn
WHERE co >= {_PMI_MIN_CO}
""",
)
def q_token_pmi_topv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between top-{_PMI_V} vocabulary
    tokens by document co-occurrence — the word-association mining
    primitive (collocations, taxonomy seeds, embedding sanity checks).
    The cap IS the scale design: presence restricted to the broadcast
    top-V head bounds the per-doc pair fan-out at V² regardless of
    corpus or vocabulary size (the same top-V + bounded-frame pattern
    as the drift monitors; an uncapped token-pair join would be the
    textual Σ basket² bug).  Doc frequencies and co-occurrence counts
    are exact integers; PMI is one ln per surviving pair."""
    from depositaja_spark.functions.text import tokens
    from depositaja_spark.functions.cache import tracked_persist

    docs = _docs(spark, sf_dir)
    tk = tracked_persist(
        docs.select("doc_id", F.explode(tokens("text")).alias("tok")).distinct()
    )
    nn = docs.agg(F.count_distinct("doc_id").cast("long").alias("n"))
    topv = (
        tk.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(_PMI_V)
    )
    pres = tk.join(F.broadcast(topv), "tok")
    a = pres.select("doc_id", F.col("tok").alias("tok_a"), F.col("df").alias("dfa"))
    b = pres.select("doc_id", F.col("tok").alias("tok_b"), F.col("df").alias("dfb"))
    pair = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.max("dfa").alias("dfa"),
            F.max("dfb").alias("dfb"),
            F.count(F.lit(1)).cast("long").alias("co"),
        )
        .filter(F.col("co") >= _PMI_MIN_CO)
    )
    return pair.crossJoin(F.broadcast(nn)).select(
        "tok_a",
        "tok_b",
        F.col("dfa").alias("df_a"),
        F.col("dfb").alias("df_b"),
        "co",
        F.round(
            F.log(
                F.col("co").cast("double")
                * F.col("n")
                / (F.col("dfa").cast("double") * F.col("dfb"))
            ),
            6,
        ).alias("pmi"),
    )


# --- per-document n-gram novelty ----------------------------------------------

_NOVELTY_N = 3


@query(
    "doc_ngram_novelty",
    f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents
           WHERE len({_TOKS}) >= {_NOVELTY_N}),
g AS (SELECT DISTINCT doc_id,
             array_to_string(toks[i + 1 : i + {_NOVELTY_N}], ' ') AS gram
      FROM (SELECT doc_id, toks, unnest(range(0, len(toks) - {_NOVELTY_N} + 1)) AS i
            FROM t)),
ft AS (SELECT gram, min(doc_id) AS fd FROM g GROUP BY 1)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN ft.fd = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(CAST(sum(CASE WHEN ft.fd = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty
FROM g JOIN ft USING (gram)
GROUP BY 1
""",
)
def q_doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document {_NOVELTY_N}-gram novelty: the fraction of a doc's
    distinct {_NOVELTY_N}-grams appearing for the FIRST time (by doc_id
    order) — the document-grain complement of vocab_growth_heaps and a
    cheap memorization/staleness signal for curriculum ordering (docs
    whose content is entirely recycled score ~0).  First appearance is
    one gram-keyed min over the distinct (doc, gram) frame (array-side
    gram construction in one codegen stage, the spans.py idiom); the
    novelty ratio is exact integers + one division."""
    from depositaja_spark.functions.text import tokens

    docs = _docs(spark, sf_dir)
    t = docs.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= _NOVELTY_N
    )
    g = t.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_NOVELTY_N} + 1),"
                f" i -> array_join(slice(toks, i, {_NOVELTY_N}), ' '))"
            )
        ).alias("gram"),
    ).distinct()
    ft = g.groupBy("gram").agg(F.min("doc_id").alias("fd"))
    j = g.join(ft, "gram")
    novel = F.sum(F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        novel.cast("long").alias("n_novel"),
        F.round(novel.cast("double") / F.count(F.lit(1)), 6).alias("novelty"),
    )


# --- modularity of the co-purchase communities ---------------------------------


def _modularity_sql() -> str:
    from depositaja_spark.functions.graph import modularity_oracle_sql

    return modularity_oracle_sql(_TRI_EDGES_SQL, _LPA_ITERATIONS)


@query("copurchase_modularity", _modularity_sql())
def q_copurchase_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q of the label-propagation partition over the
    co-purchase graph — the "did community detection actually find
    structure?" score (Q≈0 for random assignment, Q≳0.3 for real
    communities), closing the loop on copurchase_communities.  Composes
    the shared capped edge builder, the deterministic LPA rounds, and
    ``functions/graph.py:modularity`` — exact-integer I/m/ΣD_c²
    (DECIMAL-squared degrees) so Q is bit-stable with just two final
    float divisions; the oracle replays the LPA rounds as chained CTEs
    then recomputes the identical exact Q."""
    from depositaja_spark.functions.graph import label_propagation, modularity

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    labels = label_propagation(edges, _LPA_ITERATIONS)
    return modularity(edges, labels)


# --- HITS hubs & authorities over the customer->part purchase graph ------------

_HITS_ITERATIONS = 3

#: bipartite purchase edge set: one edge per (customer, part) ever
#: co-ordered — hubs are broad buyers, authorities are parts bought by
#: strong hubs (mutually reinforcing, unlike raw degree)
_HITS_EDGES_SQL = (
    "SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS p "
    "FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"
)


def _hits_sql() -> str:
    from depositaja_spark.functions.pagerank import hits_oracle_sql

    return hits_oracle_sql(_HITS_EDGES_SQL, _HITS_ITERATIONS)


@query("hits_user_part", _hits_sql())
def q_hits_user_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hub/authority ranking over the bipartite
    customer→part purchase graph: authorities are parts bought by broad
    buyers, hubs are customers buying authoritative parts — the mutual-
    reinforcement ranking raw degree misses, and the second iterative
    rank family next to PageRank (asymmetric two-sided scores vs one
    stochastic fixed point).  ``functions/pagerank.py:hits`` runs the
    un-normalized power method on exact DECIMAL integers (zero float
    folds; the single count-scaled normalization at the end is the only
    float math), so engine and oracle agree bit-for-bit by construction
    rather than by float-op-order discipline."""
    from depositaja_spark.functions.pagerank import hits

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("u"), "o_orderkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_partkey").alias("p")
    )
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey).select("u", "p").distinct()
    )
    a, h = hits(edges, _HITS_ITERATIONS)

    def side(df, id_col: str, role: str) -> DataFrame:
        tot = df.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("s").cast("double").alias("t"),
        )
        return df.crossJoin(F.broadcast(tot)).select(
            F.lit(role).alias("role"),
            F.col(id_col).cast("long").alias("id"),
            F.round(
                F.col("s").cast("double") / F.col("t") * F.col("n"), 6
            ).alias("score"),
        )

    return side(a, "p", "auth").unionByName(side(h, "u", "hub"))


# --- pairwise source n-gram contamination matrix --------------------------------

_OVERLAP_N = 3


@query(
    "source_ngram_overlap_matrix",
    f"""
WITH t AS (SELECT source, {_TOKS} AS toks FROM documents
           WHERE len({_TOKS}) >= {_OVERLAP_N}),
g AS (SELECT DISTINCT source,
             array_to_string(toks[i + 1 : i + {_OVERLAP_N}], ' ') AS gram
      FROM (SELECT source, toks,
                   unnest(range(0, len(toks) - {_OVERLAP_N} + 1)) AS i
            FROM t)),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
pair AS (SELECT a.source AS src_a, b.source AS src_b,
                CAST(count(*) AS BIGINT) AS n_common
         FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
         GROUP BY 1, 2)
SELECT p.src_a, p.src_b, p.n_common,
       za.n AS n_grams_a, zb.n AS n_grams_b,
       round(CAST(p.n_common AS DOUBLE)
             / (za.n + zb.n - p.n_common), 6) AS jaccard
FROM pair p
JOIN sz za ON p.src_a = za.source
JOIN sz zb ON p.src_b = zb.source
""",
)
def q_source_ngram_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise {_OVERLAP_N}-gram Jaccard overlap between sources — the
    corpus-level contamination / redundancy matrix behind mixture
    decisions ("are src2 and src6 the same crawl twice?"), the
    source-grain sibling of decontaminate (doc grain) and
    source_token_divergence (distribution grain).  The pair stage joins
    the DISTINCT (source, gram) frame to itself on gram, so per-gram
    fan-out is bounded by |sources|² BY CONSTRUCTION — the textual
    analog of the basket cap, with no cap constant needed because the
    source domain is fixed; everything else is gram/source-keyed
    aggregation, exact integers, one final division per pair."""
    from depositaja_spark.functions.text import tokens

    docs = _docs(spark, sf_dir)
    t = docs.select("source", tokens("text").alias("toks")).filter(
        F.size("toks") >= _OVERLAP_N
    )
    g = t.select(
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(toks) - {_OVERLAP_N} + 1),"
                f" i -> array_join(slice(toks, i, {_OVERLAP_N}), ' '))"
            )
        ).alias("gram"),
    ).distinct()
    from depositaja_spark.functions.cache import tracked_persist

    g = tracked_persist(g)
    sz = g.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = g.select(F.col("source").alias("src_a"), "gram")
    b = g.select(F.col("source").alias("src_b"), "gram")
    pair = (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    za = sz.select(F.col("source").alias("src_a"), F.col("n").alias("n_grams_a"))
    zb = sz.select(F.col("source").alias("src_b"), F.col("n").alias("n_grams_b"))
    return (
        pair.join(F.broadcast(za), "src_a")
        .join(F.broadcast(zb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "n_grams_a",
            "n_grams_b",
            F.round(
                F.col("n_common").cast("double")
                / (
                    F.col("n_grams_a") + F.col("n_grams_b") - F.col("n_common")
                ),
                6,
            ).alias("jaccard"),
        )
    )


# --- isotonic calibration (pool-adjacent-violators, minimax form) ---------------


@query(
    "isotonic_calibration",
    f"""
WITH sc AS (
  SELECT CAST({_H64.format(x=f"'{_BRIER_SALT}' || CAST(event_id AS VARCHAR)")}
              % 101 AS BIGINT) AS p_cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
g AS (
  SELECT p_cents, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS s
  FROM sc GROUP BY 1
),
p AS (
  SELECT p_cents, c, s,
         sum(c) OVER (ORDER BY p_cents) AS pc,
         sum(s) OVER (ORDER BY p_cents) AS ps
  FROM g
),
iv AS (
  SELECT a.p_cents AS j, b.p_cents AS k,
         CAST(b.ps - (a.ps - a.s) AS DOUBLE)
           / (b.pc - (a.pc - a.c)) AS avg_jk
  FROM p a JOIN p b ON a.p_cents <= b.p_cents
),
sm AS (
  SELECT j, k,
         min(avg_jk) OVER (PARTITION BY j ORDER BY k DESC) AS t_ji
  FROM iv
),
fit AS (
  SELECT j, k AS i,
         max(t_ji) OVER (PARTITION BY k ORDER BY j) AS fitted
  FROM sm
)
SELECT g.p_cents AS score_cents,
       g.c AS n,
       round(CAST(g.s AS DOUBLE) / g.c, 6) AS frac_pos,
       round(f.fitted, 6) AS fitted
FROM fit f JOIN g ON f.i = g.p_cents AND f.j = g.p_cents
""",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration of the classifier scores by
    pool-adjacent-violators, computed in its closed minimax form
    fitted(i) = max_(j<=i) min_(k>=i) avg(y over scores j..k) — the
    nonparametric calibrator sklearn ships (monotone, piecewise
    constant), here fully relational because the DISTINCT-score frame
    is bounded (<=101 rows): interval averages are single divisions of
    exact integer prefix sums over the <=101^2 interval frame, the
    suffix-min / prefix-max are ordered windows per j / per i, and the
    fitted value is read at the (j=i, k=i) diagonal where both
    cumulatives cover exactly the required ranges.  Every float is one
    division of exact integers evaluated identically in both engines,
    and min/max of identical doubles is deterministic — no epsilon
    anywhere.  Scale shape: one corpus-keyed agg to <=101 rows; the
    quadratic stage never touches the corpus (the bounded-frame analog
    of the basket cap)."""
    from depositaja_spark.functions.text import hash64

    ev = load_table(spark, sf_dir, "events")
    sc = ev.select(
        (
            hash64(
                F.concat(F.lit(_BRIER_SALT), F.col("event_id").cast("string"))
            )
            % 101
        ).alias("p_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = sc.groupBy("p_cents").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("s"),
    )
    w_ord = W.partitionBy().orderBy("p_cents").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    p = g.select(
        "p_cents",
        "c",
        "s",
        F.sum("c").over(w_ord).alias("pc"),
        F.sum("s").over(w_ord).alias("ps"),
    )
    a = p.select(
        F.col("p_cents").alias("j"),
        (F.col("ps") - F.col("s")).alias("psb"),
        (F.col("pc") - F.col("c")).alias("pcb"),
    )
    b = p.select(
        F.col("p_cents").alias("k"),
        F.col("ps").alias("psk"),
        F.col("pc").alias("pck"),
    )
    iv = a.join(b, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("psk") - F.col("psb")).cast("double")
            / (F.col("pck") - F.col("pcb"))
        ).alias("avg_jk"),
    )
    w_suf = W.partitionBy("j").orderBy(F.col("k").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sm = iv.select(
        "j", "k", F.min("avg_jk").over(w_suf).alias("t_ji")
    )
    w_pre = W.partitionBy("i").orderBy("j").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    fit = sm.select("j", F.col("k").alias("i"), "t_ji").select(
        "j",
        "i",
        F.max("t_ji").over(w_pre).alias("fitted"),
    )
    return (
        fit.filter(F.col("j") == F.col("i"))
        .join(g, F.col("i") == F.col("p_cents"))
        .select(
            F.col("p_cents").alias("score_cents"),
            F.col("c").alias("n"),
            F.round(F.col("s").cast("double") / F.col("c"), 6).alias(
                "frac_pos"
            ),
            F.round("fitted", 6).alias("fitted"),
        )
    )


# --- cumulative gains / lift table ----------------------------------------------


@query(
    "classifier_gains_table",
    f"""
WITH sc AS (
  SELECT CAST({_H64.format(x=f"'{_BRIER_SALT}' || CAST(event_id AS VARCHAR)")}
              % 101 AS BIGINT) AS p_cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
g AS (
  SELECT p_cents, CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS s
  FROM sc GROUP BY 1
),
cum AS (
  SELECT p_cents, c, s,
         sum(c) OVER (ORDER BY p_cents DESC) AS cn,
         sum(s) OVER (ORDER BY p_cents DESC) AS cp,
         sum(c) OVER () AS n,
         sum(s) OVER () AS pos
  FROM g
)
SELECT CAST(p_cents AS BIGINT) AS score_cents,
       CAST(cn AS BIGINT) AS cum_n,
       CAST(cp AS BIGINT) AS cum_pos,
       round(CAST(cn AS DOUBLE) / n, 6) AS frac_population,
       CASE WHEN pos > 0 THEN round(CAST(cp AS DOUBLE) / pos, 6) END
         AS recall,
       round(CAST(cp AS DOUBLE) / cn, 6) AS precision,
       CASE WHEN pos > 0
            THEN round((CAST(cp AS DOUBLE) / cn)
                       / (CAST(pos AS DOUBLE) / n), 6) END AS lift
FROM cum
""",
)
def q_classifier_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cumulative gains / lift table (and with it every
    precision-recall curve point): descending-score cumulative
    population and positives at each distinct score — "target the top
    X% and capture Y% of converters at Z× lift", the campaign-sizing
    read-out next to AUC (ranking), calibration (probability), and KS
    (separation).  All counts are exact integers off one corpus-keyed
    agg; the ≤101-row distinct-score frame carries the ordered
    cumulatives, and every output is a single division (guarded NULL
    when no positives exist, identically in both engines)."""
    from depositaja_spark.functions.text import hash64

    ev = load_table(spark, sf_dir, "events")
    sc = ev.select(
        (
            hash64(
                F.concat(F.lit(_BRIER_SALT), F.col("event_id").cast("string"))
            )
            % 101
        ).alias("p_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = sc.groupBy("p_cents").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("y").cast("long").alias("s"),
    )
    w_desc = W.partitionBy().orderBy(F.col("p_cents").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy()
    cum = g.select(
        "p_cents",
        F.sum("c").over(w_desc).alias("cn"),
        F.sum("s").over(w_desc).alias("cp"),
        F.sum("c").over(w_all).alias("n"),
        F.sum("s").over(w_all).alias("pos"),
    )
    prec = F.col("cp").cast("double") / F.col("cn")
    return cum.select(
        F.col("p_cents").cast("long").alias("score_cents"),
        F.col("cn").cast("long").alias("cum_n"),
        F.col("cp").cast("long").alias("cum_pos"),
        F.round(F.col("cn").cast("double") / F.col("n"), 6).alias(
            "frac_population"
        ),
        F.when(
            F.col("pos") > 0,
            F.round(F.col("cp").cast("double") / F.col("pos"), 6),
        ).alias("recall"),
        F.round(prec, 6).alias("precision"),
        F.when(
            F.col("pos") > 0,
            F.round(
                prec / (F.col("pos").cast("double") / F.col("n")), 6
            ),
        ).alias("lift"),
    )


# --- Kolmogorov-Smirnov separation of the classifier ----------------------------


@query(
    "classifier_ks",
    f"""
WITH sc AS (
  SELECT CAST({_H64.format(x=f"'{_BRIER_SALT}' || CAST(event_id AS VARCHAR)")}
              % 101 AS BIGINT) AS p_cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
g AS (
  SELECT p_cents,
         CAST(sum(y) AS BIGINT) AS s,
         CAST(count(*) - sum(y) AS BIGINT) AS f
  FROM sc GROUP BY 1
),
cum AS (
  SELECT p_cents,
         sum(s) OVER (ORDER BY p_cents DESC) AS cp,
         sum(f) OVER (ORDER BY p_cents DESC) AS cf,
         sum(s) OVER () AS pos,
         sum(f) OVER () AS neg
  FROM g
),
d AS (
  SELECT p_cents, pos, neg,
         CAST(cp AS DOUBLE) / pos - CAST(cf AS DOUBLE) / neg AS gap,
         row_number() OVER (
           ORDER BY abs(CAST(cp AS DOUBLE) / pos
                        - CAST(cf AS DOUBLE) / neg) DESC,
                    p_cents DESC) AS rn
  FROM cum WHERE pos > 0 AND neg > 0
)
SELECT CAST(p_cents AS BIGINT) AS threshold_cents,
       CAST(pos AS BIGINT) AS n_pos,
       CAST(neg AS BIGINT) AS n_neg,
       round(abs(gap), 6) AS ks_stat,
       round(gap, 6) AS tpr_minus_fpr
FROM d WHERE rn = 1
""",
)
def q_classifier_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kolmogorov-Smirnov separation statistic of the classifier:
    max over thresholds of |TPR − FPR| (equivalently the max vertical
    gap between the positive and negative score CDFs) plus the
    threshold attaining it — credit-scoring's standard single-number
    discrimination measure, the CDF-gap complement of ROC-AUC.  TPR/FPR
    come from exact integer cumulatives on the ≤101-row distinct-score
    frame; each gap is two divisions of exact integers evaluated
    identically in both engines, and the argmax tie-breaks on the
    higher threshold — fully deterministic."""
    from depositaja_spark.functions.text import hash64

    ev = load_table(spark, sf_dir, "events")
    sc = ev.select(
        (
            hash64(
                F.concat(F.lit(_BRIER_SALT), F.col("event_id").cast("string"))
            )
            % 101
        ).alias("p_cents"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    g = sc.groupBy("p_cents").agg(
        F.sum("y").cast("long").alias("s"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("f"),
    )
    w_desc = W.partitionBy().orderBy(F.col("p_cents").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.partitionBy()
    cum = g.select(
        "p_cents",
        F.sum("s").over(w_desc).alias("cp"),
        F.sum("f").over(w_desc).alias("cf"),
        F.sum("s").over(w_all).alias("pos"),
        F.sum("f").over(w_all).alias("neg"),
    )
    gap = (
        F.col("cp").cast("double") / F.col("pos")
        - F.col("cf").cast("double") / F.col("neg")
    )
    d = cum.filter((F.col("pos") > 0) & (F.col("neg") > 0)).select(
        "p_cents",
        "pos",
        "neg",
        gap.alias("gap"),
        F.row_number()
        .over(
            W.partitionBy().orderBy(
                F.abs(gap).desc(), F.col("p_cents").desc()
            )
        )
        .alias("rn"),
    )
    return d.filter(F.col("rn") == 1).select(
        F.col("p_cents").cast("long").alias("threshold_cents"),
        F.col("pos").cast("long").alias("n_pos"),
        F.col("neg").cast("long").alias("n_neg"),
        F.round(F.abs("gap"), 6).alias("ks_stat"),
        F.round("gap", 6).alias("tpr_minus_fpr"),
    )


# --- per-node clustering coefficient --------------------------------------------


@query(
    "copurchase_clustering_coeff",
    f"""
WITH e AS ({_TRI_EDGES_SQL}),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
t AS (SELECT node, CAST(count(*) AS BIGINT) AS nt FROM corners GROUP BY 1),
und AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY 1)
SELECT d.node AS part,
       d.deg AS degree,
       coalesce(t.nt, 0) AS n_triangles,
       CASE WHEN d.deg >= 2
            THEN round(2.0 * coalesce(t.nt, 0) / (d.deg * (d.deg - 1)), 6)
       END AS clustering_coeff
FROM deg d LEFT JOIN t ON d.node = t.node
""",
)
def q_copurchase_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part local clustering coefficient over the co-purchase graph:
    2·T(v) / (deg(v)·(deg(v)−1)) — "how clique-like is each part's
    neighborhood", the node-grain refinement of the global triangle
    count (bundle-shaped parts score ~1, bridge parts ~0).  Per-node
    triangle counts come from the SAME degree-oriented wedge closure as
    copurchase_triangles (every triangle found once, hub fan-out
    removed by orientation, O(E^1.5) worst-case) with the corners
    exploded ×3 into one keyed count
    (``functions/graph.py:triangles_per_node``); the oracle is the
    textbook 3-way canonical join + corner union.  Exact integers plus
    one guarded division (NULL below degree 2 in both engines)."""
    from depositaja_spark.functions.graph import triangles_per_node

    li = load_table(spark, sf_dir, "lineitem")
    edges = _copurchase_edges(li, min_support=_TRI_MIN_SUPPORT)
    from depositaja_spark.functions.cache import tracked_persist

    e = tracked_persist(edges)
    t = triangles_per_node(e, src_col="u", dst_col="v")
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    j = deg.join(t, "node", "left")
    nt = F.coalesce(F.col("n_tri"), F.lit(0))
    return j.select(
        F.col("node").alias("part"),
        F.col("deg").alias("degree"),
        nt.cast("long").alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                2.0 * nt / (F.col("deg") * (F.col("deg") - 1)), 6
            ),
        ).alias("clustering_coeff"),
    )


# --- leakage-safe k-fold target encoding ---------------------------------------
#
# The standard categorical feature for tabular models: per (category,
# fold), the smoothed mean target computed from the OTHER folds only —
# out-of-fold so the encoding never sees its own row's label (the
# leakage the naive groupBy-mean version commits).  Smoothing blends
# toward the out-of-fold global prior with pseudo-count m.  Everything
# is integer counts combined in float64 at the end, so both engines
# compute bit-identical encodings.

_TE_FOLDS = 5
_TE_SMOOTH = 20.0

_TARGET_ENCODE_SQL = f"""
WITH r AS (SELECT o_orderpriority AS cat, o_orderkey % {_TE_FOLDS} AS fold,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
           FROM orders),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_all, CAST(sum(y) AS BIGINT) AS s_all
      FROM r),
gf AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_f, CAST(sum(y) AS BIGINT) AS s_f
       FROM r GROUP BY fold),
c AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_c, CAST(sum(y) AS BIGINT) AS s_c
      FROM r GROUP BY cat),
cf AS (SELECT cat, fold, CAST(count(*) AS BIGINT) AS n_cf,
              CAST(sum(y) AS BIGINT) AS s_cf
       FROM r GROUP BY cat, fold)
SELECT cf.cat, CAST(cf.fold AS BIGINT) AS fold, cf.n_cf AS n_rows,
       round((c.s_c - cf.s_cf
              + {_TE_SMOOTH} * (g.s_all - gf.s_f) / (g.n_all - gf.n_f))
             / (c.n_c - cf.n_cf + {_TE_SMOOTH}), 6) AS enc
FROM cf JOIN c USING (cat) JOIN gf USING (fold) CROSS JOIN g
"""


@query("target_encode_priority", _TARGET_ENCODE_SQL)
def q_target_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 5-fold target encoding of order priority
    against the is-fulfilled label: per (category, fold) the smoothed
    out-of-fold target mean, prior blended at m={_TE_SMOOTH}.  Four
    keyed integer aggs over the fact scan; the final arithmetic runs on
    the |cats|×|folds| bounded frame with the global moment attached as
    a 1-row broadcast."""
    orders = load_table(spark, sf_dir, "orders")
    r = orders.select(
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderkey") % _TE_FOLDS).alias("fold"),
        F.when(F.col("o_orderstatus") == "F", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    g = r.agg(
        F.count(F.lit(1)).alias("n_all"), F.sum("y").alias("s_all")
    )
    gf = r.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_f"), F.sum("y").alias("s_f")
    )
    c = r.groupBy("cat").agg(
        F.count(F.lit(1)).alias("n_c"), F.sum("y").alias("s_c")
    )
    cf = r.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n_cf"), F.sum("y").alias("s_cf")
    )
    prior = (F.col("s_all") - F.col("s_f")) / (F.col("n_all") - F.col("n_f"))
    enc = (F.col("s_c") - F.col("s_cf") + F.lit(_TE_SMOOTH) * prior) / (
        F.col("n_c") - F.col("n_cf") + F.lit(_TE_SMOOTH)
    )
    return (
        cf.join(c, "cat")
        .join(gf, "fold")
        .crossJoin(F.broadcast(g))
        .select(
            "cat",
            F.col("fold").cast("long").alias("fold"),
            F.col("n_cf").alias("n_rows"),
            F.round(enc, 6).alias("enc"),
        )
    )


# --- split-conformal prediction interval ---------------------------------------
#
# Distribution-free uncertainty for any point predictor: fit on the
# train folds (here the per-type mean — swap in any scorer, the
# conformal wrapper is unchanged), take the 0.9 quantile of absolute
# calibration residuals as the interval half-width, then measure
# empirical coverage on the held-out test fold.  The quantile uses the
# percentile ⇄ quantile_cont continuous-interpolation pair proven by
# order_price_percentiles; residuals are round-6 pinned before it.

_CONF_Q = 0.9

_CONFORMAL_SQL = f"""
WITH tr AS (SELECT event_type, round(avg(value), 6) AS pred
            FROM events WHERE event_id % 5 IN (0, 1, 2) GROUP BY event_type),
cal AS (SELECT round(abs(value - pred), 6) AS resid
        FROM events e JOIN tr USING (event_type) WHERE event_id % 5 = 3),
q AS (SELECT CAST(count(*) AS BIGINT) AS n_cal,
             round(quantile_cont(resid, {_CONF_Q}), 6) AS qhat
      FROM cal),
te AS (SELECT round(abs(value - pred), 6) AS resid
       FROM events e JOIN tr USING (event_type) WHERE event_id % 5 = 4)
SELECT n_cal, qhat, CAST(count(*) AS BIGINT) AS n_test,
       CAST(count(*) FILTER (WHERE resid <= qhat) AS BIGINT) AS n_covered,
       round(CAST(count(*) FILTER (WHERE resid <= qhat) AS DOUBLE)
             / count(*), 4) AS coverage
FROM te CROSS JOIN q GROUP BY n_cal, qhat
"""


@query("conformal_value_interval", _CONFORMAL_SQL)
def q_conformal_value_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval around the per-type mean-value
    predictor: q̂ = the 0.9 calibration-residual quantile, plus
    the empirical test-fold coverage (should sit near 0.9 by the
    conformal guarantee).  Train/cal/test split by event_id mod 5; the
    predictor frame is |types|-bounded, q̂ is a 1-row broadcast onto
    the test scan."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    fold = F.col("event_id") % 5
    tr = (
        ev.where(fold.isin(0, 1, 2))
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("pred"))
    )
    resid = F.round(F.abs(F.col("value") - F.col("pred")), 6).alias("resid")
    cal = ev.where(fold == 3).join(tr, "event_type").select(resid)
    q = cal.agg(
        F.count(F.lit(1)).alias("n_cal"),
        F.round(F.percentile("resid", F.lit(_CONF_Q)), 6).alias("qhat"),
    )
    te = ev.where(fold == 4).join(tr, "event_type").select(resid)
    covered = F.sum(
        F.when(F.col("resid") <= F.col("qhat"), F.lit(1)).otherwise(F.lit(0))
    )
    return (
        te.crossJoin(F.broadcast(q))
        .groupBy("n_cal", "qhat")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            covered.alias("n_covered"),
            F.round(
                covered.cast("double") / F.count(F.lit(1)), 4
            ).alias("coverage"),
        )
    )


# --- always-valid sequential A/B (mSPRT) -----------------------------------------
#
# Peeking at a fixed-horizon z-test inflates false positives; the
# mixture sequential probability ratio test (mSPRT, Johari et al.)
# gives an ALWAYS-VALID p-value: monitor it daily and stop any time.
# Normal-mixture closed form on the running proportion difference:
#   log Λ_n = ½·ln(Vn/(Vn+τ²)) + θ̂²·τ² / (2·Vn·(Vn+τ²))
#   p_n     = min(1, exp(−max_{m≤n} log Λ_m))
# All inputs are exact integer cumulative counts; the float chain is
# one fixed expression per day (log scale keeps values O(10), so
# round-6 absorbs engine libm 1-ulp differences that would be visible
# on raw Λ).  The day axis is calendar-bounded, so every window runs
# on the bounded daily frame, never the event stream.

_MSPRT_TAU2 = 0.0025  # mixture variance (τ = 0.05 on the diff scale)

_MSPRT_SQL = f"""
WITH assign AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 2 AS arm,
         min(date_trunc('day', ts)) AS d0,
         max(CASE WHEN event_type = 'purchase' AND value >= 150
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT d0 AS day,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS k0,
         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1
  FROM assign GROUP BY 1
),
cum AS (
  SELECT day,
         sum(k0) OVER (ORDER BY day) AS n0,
         sum(x0) OVER (ORDER BY day) AS c0,
         sum(k1) OVER (ORDER BY day) AS n1,
         sum(x1) OVER (ORDER BY day) AS c1
  FROM grid
),
stat AS (
  SELECT day, n0, n1,
         CASE WHEN n0 > 0 AND n1 > 0
                   AND c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
           0.5 * ln((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
                     * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                     * (1.0 / n0 + 1.0 / n1))
                    / (CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
                       * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                       * (1.0 / n0 + 1.0 / n1) + {_MSPRT_TAU2}))
           + (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             * (CAST(c1 AS DOUBLE) / n1 - CAST(c0 AS DOUBLE) / n0)
             * {_MSPRT_TAU2}
             / (2.0 * (CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
                       * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                       * (1.0 / n0 + 1.0 / n1))
                * (CAST(c0 + c1 AS DOUBLE) / (n0 + n1)
                   * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                   * (1.0 / n0 + 1.0 / n1) + {_MSPRT_TAU2}))
         END AS ll
  FROM cum
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treatment,
       round(ll, 6) AS log_lambda,
       CASE WHEN max(ll) OVER (ORDER BY day) IS NULL THEN 1.0
            ELSE round(least(1.0, exp(-max(ll) OVER (ORDER BY day))), 6)
       END AS always_valid_p
FROM stat
"""


@query("msprt_ab_sequential", _MSPRT_SQL)
def q_msprt_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily always-valid p-value for the hash-split conversion A/B via
    the normal-mixture mSPRT (τ² = 0.0025) — the
    peeking-safe sequential readout next to the fixed-horizon
    ``ab_conversion_ztest``.  One user-keyed agg (arrival day +
    conversion flag), one day-keyed agg, then cumulative and
    running-max windows over the calendar-bounded daily frame."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as _W

    from depositaja_spark.functions.text import hash64

    arm = (hash64(F.col("user_id").cast("string")) % 2).alias("arm")
    assign = (
        ev.groupBy("user_id", arm)
        .agg(
            F.min(F.date_trunc("day", "ts")).alias("d0"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("conv"),
        )
    )
    grid = assign.groupBy(F.col("d0").alias("day")).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("k0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("x0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("k1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("x1"),
    )
    w = _W.orderBy("day").rowsBetween(_W.unboundedPreceding, _W.currentRow)
    cum = grid.select(
        "day",
        F.sum("k0").over(w).alias("n0"),
        F.sum("x0").over(w).alias("c0"),
        F.sum("k1").over(w).alias("n1"),
        F.sum("x1").over(w).alias("c1"),
    )
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    vn = pp * (F.lit(1.0) - pp) * (
        F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1")
    )
    theta = F.col("c1").cast("double") / F.col("n1") - F.col("c0").cast(
        "double"
    ) / F.col("n0")
    ll = F.when(
        (F.col("n0") > 0)
        & (F.col("n1") > 0)
        & (F.col("c0") + F.col("c1") > 0)
        & (F.col("c0") + F.col("c1") < F.col("n0") + F.col("n1")),
        F.lit(0.5) * F.log(vn / (vn + F.lit(_MSPRT_TAU2)))
        + theta * theta * F.lit(_MSPRT_TAU2)
        / (F.lit(2.0) * vn * (vn + F.lit(_MSPRT_TAU2))),
    )
    stat = cum.select("day", "n0", "n1", ll.alias("ll"))
    wmax = _W.orderBy("day").rowsBetween(_W.unboundedPreceding, _W.currentRow)
    mx = F.max("ll").over(wmax)
    return stat.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treatment"),
        F.round("ll", 6).alias("log_lambda"),
        F.when(mx.isNull(), F.lit(1.0))
        .otherwise(F.round(F.least(F.lit(1.0), F.exp(-mx)), 6))
        .alias("always_valid_p"),
    )


# --- stratified average treatment effect -----------------------------------------
#
# The post-stratification estimator: ATE = Σ_s w_s (p̂1s − p̂0s) with
# w_s = n_s/N, SE² = Σ_s w_s² (p̂0(1−p̂0)/n0s + p̂1(1−p̂1)/n1s) — the
# standard variance-reduction/imbalance-correction readout next to
# CUPED.  Strata = fixed activity tiers (literal event-count buckets,
# no global sort); arms = the shared md5-parity split.  All counts are
# exact integers; the weighted folds run over the ≤4-row strata frame.

_ATE_BUCKETS = "CASE WHEN ne <= 5 THEN 't1' WHEN ne <= 10 THEN 't2' " \
               "WHEN ne <= 20 THEN 't3' ELSE 't4' END"

_STRAT_ATE_SQL = f"""
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 2 AS arm,
         count(*) AS ne,
         max(CASE WHEN event_type = 'purchase' AND value >= 150
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT {_ATE_BUCKETS} AS stratum,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
  FROM u GROUP BY 1
),
k AS (SELECT * FROM s WHERE n0 > 0 AND n1 > 0),
t AS (SELECT CAST(sum(n0 + n1) AS DOUBLE) AS nn,
             CAST(count(*) AS BIGINT) AS n_strata FROM k)
SELECT CAST(t.n_strata AS BIGINT) AS n_strata,
       CAST(t.nn AS BIGINT) AS n_users,
       round(sum(((k.n0 + k.n1) / t.nn)
                 * (CAST(k.c1 AS DOUBLE) / k.n1
                    - CAST(k.c0 AS DOUBLE) / k.n0)), 6) AS ate,
       round(sqrt(sum(((k.n0 + k.n1) / t.nn) * ((k.n0 + k.n1) / t.nn)
                 * ((CAST(k.c0 AS DOUBLE) / k.n0)
                    * (1.0 - CAST(k.c0 AS DOUBLE) / k.n0) / k.n0
                    + (CAST(k.c1 AS DOUBLE) / k.n1)
                      * (1.0 - CAST(k.c1 AS DOUBLE) / k.n1) / k.n1))), 6) AS se
FROM k CROSS JOIN t
GROUP BY t.n_strata, t.nn
"""


@query("stratified_ate_conversion", _STRAT_ATE_SQL)
def q_stratified_ate_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified ATE of the hash-split conversion experiment
    across fixed activity tiers (≤5 / ≤10 / ≤20 / >20 events per user)
    with its analytic standard error — the imbalance-corrected
    companion to ab_conversion_ztest and cuped_variance_reduction.
    One user-keyed agg, one ≤4-row strata frame, one 1-row total
    broadcast."""
    ev = load_table(spark, sf_dir, "events")
    from depositaja_spark.functions.text import hash64

    u = ev.groupBy(
        "user_id", (hash64(F.col("user_id").cast("string")) % 2).alias("arm")
    ).agg(
        F.count(F.lit(1)).alias("ne"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("conv"),
    )
    stratum = (
        F.when(F.col("ne") <= 5, F.lit("t1"))
        .when(F.col("ne") <= 10, F.lit("t2"))
        .when(F.col("ne") <= 20, F.lit("t3"))
        .otherwise(F.lit("t4"))
    )
    s = u.groupBy(stratum.alias("stratum")).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv")).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv")).otherwise(0)).alias("c1"),
    )
    k = s.where((F.col("n0") > 0) & (F.col("n1") > 0))
    t = k.agg(
        F.sum(F.col("n0") + F.col("n1")).cast("double").alias("nn"),
        F.count(F.lit(1)).alias("n_strata"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    w = (F.col("n0") + F.col("n1")) / F.col("nn")
    return (
        k.crossJoin(F.broadcast(t))
        .groupBy("n_strata", "nn")
        .agg(
            F.round(F.sum(w * (p1 - p0)), 6).alias("ate"),
            F.round(
                F.sqrt(
                    F.sum(
                        w * w * (p0 * (F.lit(1.0) - p0) / F.col("n0")
                                 + p1 * (F.lit(1.0) - p1) / F.col("n1"))
                    )
                ),
                6,
            ).alias("se"),
        )
        .select(
            F.col("n_strata").cast("long").alias("n_strata"),
            F.col("nn").cast("long").alias("n_users"),
            "ate",
            "se",
        )
    )
