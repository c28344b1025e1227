"""Data-governance query tier: privacy audits (k-anonymity /
l-diversity / re-identification risk), readability profiling,
calendar-grid interval-overlap join, TextRank keyword extraction, and
embedding outlier scoring.

Beyond-the-reference families a training-data pipeline needs before any
corpus ships (SURVEY.md §6): privacy release audits (Sweeney 2002
k-anonymity; Machanavajjhala et al. 2007 l-diversity), readability
scoring (Flesch 1948 / Kincaid 1975 — a standard document-quality
signal next to the Gopher/CCNet filters), an interval×calendar overlap
join expressed as a bucket-explode (the Spark-native way to avoid a
range join), TextRank (Mihalcea & Tarau 2004 — keyword extraction as
PageRank over the token co-occurrence graph, reusing
``functions/pagerank.py``), and a diagonal-Mahalanobis outlier score
over the embedding corpus (the cheap pre-index anomaly scan).

Same contract as every other query module: each query couples a Spark
DataFrame plan with a DuckDB oracle generated from the same
module-level constants; every computed column is aliased identically on
both sides; float folds follow the row-local aggregate + round-6
convention of ``embedding_norm_stats``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from depositaja_spark.functions import text as tx
from depositaja_spark.functions.pagerank import (
    weighted_pagerank,
    weighted_pagerank_oracle_sql,
)
from depositaja_spark.queries_ext import _docs
from depositaja_spark.registry import query
from depositaja_spark.sources import load_table

# --- privacy audits -----------------------------------------------------------
#
# Records = orders enriched with the owning customer's demographic
# attributes.  Quasi-identifier (the columns an attacker can link on):
# (nation, market segment, order month).  Sensitive attribute for
# l-diversity: the order priority.  Both audits are two keyed
# aggregations — equivalence classes, then a bounded histogram — so the
# plan is one fact⋈dim shuffle join plus map-side-combining aggs; the
# histogram key space is bounded by the largest class size, never the
# corpus.

_QI_SQL = """
SELECT c_nationkey, c_mktsegment,
       strftime(o_orderdate, '%Y-%m') AS qi_month,
       o_orderpriority
FROM orders JOIN customer ON o_custkey = c_custkey
"""

#: classes smaller than this are treated as re-identifiable
_K_MIN = 5


def _qi_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "c_nationkey",
        "c_mktsegment",
        F.date_format("o_orderdate", "yyyy-MM").alias("qi_month"),
        "o_orderpriority",
    )


@query(
    "k_anonymity_audit",
    f"""
WITH rec AS ({_QI_SQL}),
cls AS (SELECT count(*) AS k
        FROM rec GROUP BY c_nationkey, c_mktsegment, qi_month)
SELECT CAST(k AS BIGINT) AS class_size,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_records
FROM cls GROUP BY k
""",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the order release under the
    (nation, segment, month) quasi-identifier: the histogram of
    equivalence-class sizes.  ``min(class_size)`` is the release's k;
    rows in small classes are the linkable ones.  Two keyed aggs — the
    class agg shuffles on the QI key (bounded by
    |nations|×|segments|×|months|), the histogram on the class size."""
    cls = (
        _qi_records(spark, sf_dir)
        .groupBy("c_nationkey", "c_mktsegment", "qi_month")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    return cls.groupBy(F.col("k").alias("class_size")).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_records"),
    )


@query(
    "l_diversity_audit",
    f"""
WITH rec AS ({_QI_SQL}),
cls AS (SELECT count(*) AS k,
               count(DISTINCT o_orderpriority) AS l
        FROM rec GROUP BY c_nationkey, c_mktsegment, qi_month)
SELECT CAST(l AS BIGINT) AS l_distinct,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_records
FROM cls GROUP BY l
""",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: per QI equivalence class, how many DISTINCT
    sensitive values (order priority) it contains — classes with l=1
    leak the sensitive attribute exactly even when k is large.  Output
    is the histogram over l.  Same two-agg shape as the k audit; the
    distinct count is per-class (bounded domain), not global."""
    cls = (
        _qi_records(spark, sf_dir)
        .groupBy("c_nationkey", "c_mktsegment", "qi_month")
        .agg(
            F.count(F.lit(1)).alias("k"),
            F.countDistinct("o_orderpriority").alias("l"),
        )
    )
    return cls.groupBy(F.col("l").alias("l_distinct")).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("k").alias("n_records"),
    )


@query(
    "reident_risk_by_nation",
    f"""
WITH rec AS ({_QI_SQL}),
cls AS (SELECT c_nationkey, count(*) AS k
        FROM rec GROUP BY c_nationkey, c_mktsegment, qi_month)
SELECT c_nationkey,
       CAST(sum(k) AS BIGINT) AS n_records,
       CAST(sum(CASE WHEN k < {_K_MIN} THEN k ELSE 0 END) AS BIGINT) AS n_risky,
       round(100.0 * sum(CASE WHEN k < {_K_MIN} THEN k ELSE 0 END) / sum(k), 4)
         AS risk_pct
FROM cls GROUP BY c_nationkey
""",
)
def q_reident_risk_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-identification exposure drilldown: per nation, the share of
    order records sitting in QI classes smaller than k=5 — the
    rows a generalization/suppression pass would have to treat before
    release.  Integer counts, one float division rounded at 4."""
    cls = (
        _qi_records(spark, sf_dir)
        .groupBy("c_nationkey", "c_mktsegment", "qi_month")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    risky = F.sum(F.when(F.col("k") < _K_MIN, F.col("k")).otherwise(F.lit(0)))
    return cls.groupBy("c_nationkey").agg(
        F.sum("k").alias("n_records"),
        risky.alias("n_risky"),
        F.round(F.lit(100.0) * risky / F.sum("k"), 4).alias("risk_pct"),
    )


# --- readability profiling ----------------------------------------------------
#
# Flesch reading ease / Flesch-Kincaid grade from three deterministic
# integer counters: words (whitespace tokens), syllables (vowel-group
# runs — the standard heuristic), sentences.  The synthetic corpus
# carries no sentence terminators, so "sentence" is pinned to a fixed
# 16-token chunk (documented stand-in; on a real corpus the counter
# swaps to [.!?]+ groups and the plan is unchanged).  Everything is
# row-local scan-side arithmetic — the only shuffle is the per-source
# aggregation.

_SENT_TOKENS = 16
_FLESCH_HARD = 50.0  # below this = "difficult" (standard scale boundary)

_READ_DOC_SQL = f"""
SELECT source,
       len(string_split(text, ' ')) AS words,
       greatest(CAST(floor((len(string_split(text, ' ')) + {_SENT_TOKENS - 1})
                           / {_SENT_TOKENS}) AS BIGINT), 1) AS sents,
       len(regexp_extract_all(text, '[aeiouy]+')) AS syls
FROM documents
"""


def readability_doc_metrics(docs: DataFrame) -> DataFrame:
    """Per-document Flesch / Flesch-Kincaid over any frame with a
    ``text`` column (other columns pass through) — exact-integer
    counters combined in float64, purely row-local."""
    words = F.size(F.split(F.col("text"), " ")).cast("long")
    sents = F.greatest(
        F.floor((words + F.lit(_SENT_TOKENS - 1)) / F.lit(_SENT_TOKENS)).cast("long"),
        F.lit(1).cast("long"),
    )
    syls = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    wps = words / sents.cast("double")
    spw = syls / F.greatest(words, F.lit(1).cast("long")).cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return docs.withColumn("flesch", flesch).withColumn("fk", fk)


@query(
    "readability_by_source",
    f"""
WITH d AS ({_READ_DOC_SQL}),
f AS (SELECT source,
             206.835 - 1.015 * (words / CAST(sents AS DOUBLE))
                     - 84.6 * (syls / CAST(greatest(words, 1) AS DOUBLE)) AS flesch,
             0.39 * (words / CAST(sents AS DOUBLE))
                  + 11.8 * (syls / CAST(greatest(words, 1) AS DOUBLE)) - 15.59 AS fk
      FROM d)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(flesch), 4) AS avg_flesch,
       round(avg(fk), 4) AS avg_fk_grade,
       CAST(count(*) FILTER (WHERE flesch < {_FLESCH_HARD}) AS BIGINT) AS n_difficult
FROM f GROUP BY source
""",
)
def q_readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source readability profile: mean Flesch reading ease, mean
    Flesch-Kincaid grade, and the count of difficult documents
    (Flesch < 50.0).  The per-doc metrics are exact-integer
    counters combined in float64 — identical IEEE ops on both engines —
    and only the per-source means carry summation-order noise, absorbed
    by round-4 per registry convention."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        readability_doc_metrics(docs)
        .select("source", "flesch", "fk")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("flesch"), 4).alias("avg_flesch"),
            F.round(F.avg("fk"), 4).alias("avg_fk_grade"),
            F.sum(
                F.when(F.col("flesch") < _FLESCH_HARD, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_difficult"),
        )
    )


# --- interval × calendar-grid overlap join ------------------------------------
#
# "How many orders were open in each month" — an interval-overlap join
# between per-order activity intervals [orderdate, last shipdate] and
# the month grid.  Spark has no range-join operator; the scale path is
# to EXPLODE each interval onto the grid keys it covers (sequence +
# explode — per-row fanout bounded by the calendar span, here ≤ 81
# months) and aggregate by grid key: a linear scan-side fanout plus one
# keyed agg, instead of an O(intervals × grid) range join.  The oracle
# replays the identical per-interval month expansion in DuckDB.

_OPEN_MONTHS_SQL = """
WITH iv AS (
  SELECT o_orderkey, o_orderdate AS s,
         greatest(max(l_shipdate), o_orderdate) AS e
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, o_orderdate
),
m AS (
  SELECT strftime(t.m, '%Y-%m') AS month
  FROM iv, LATERAL (
    SELECT unnest(generate_series(date_trunc('month', s),
                                  date_trunc('month', e),
                                  INTERVAL 1 MONTH)) AS m
  ) t
)
SELECT month, CAST(count(*) AS BIGINT) AS n_open
FROM m GROUP BY month
"""


def interval_month_counts(iv: DataFrame) -> DataFrame:
    """Bucket-explode interval join core: ``iv`` carries timestamp
    columns ``s``/``e`` (s ≤ e); each interval is expanded onto the
    calendar months it covers and counted per month."""
    months = F.explode(
        F.sequence(
            F.date_trunc("month", F.col("s")),
            F.date_trunc("month", F.col("e")),
            F.expr("interval 1 month"),
        )
    )
    # group on the raw month timestamp and format AFTER the agg: the
    # string render runs on the |months| output rows, not the exploded
    # interval multiset
    return (
        iv.select(months.alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("n_open"))
        .select(F.date_format("m", "yyyy-MM").alias("month"), "n_open")
    )


@query("orders_open_by_month", _OPEN_MONTHS_SQL)
def q_orders_open_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order count per calendar month via the bucket-explode
    interval join: each order's [orderdate, last shipdate] interval is
    expanded onto the months it covers with ``sequence`` + ``explode``
    (calendar-bounded fanout), then counted per month — no range join,
    no cartesian, one keyed agg.

    r12 plan fix (the sf10 ledger measured the old plan ×25.45 under
    10× data): joining orders⋈lineitem BEFORE the per-order max made
    the SortMergeJoin shuffle AND sort the full lineitem fact (the
    n·log n sort over 60M rows was the superlinear term — see
    SCALING.md r12).  The per-order ``max(l_shipdate)`` is algebraic,
    so it pushes BELOW the join: pre-aggregate lineitem with map-side
    partial combine (fact rows collapse to one row per order inside
    the scan stage), then join two order-sized sides.  Same result,
    one fact-sized shuffle removed."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    last_ship = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("mx"))
    iv = (
        orders.select("o_orderkey", "o_orderdate")
        .join(last_ship, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_orderdate").alias("s"),
            F.greatest("mx", F.col("o_orderdate")).alias("e"),
        )
    )
    return interval_month_counts(iv)


# --- TextRank keyword extraction ----------------------------------------------
#
# PageRank over the token co-occurrence graph (adjacent non-stopword
# token pairs, both directions, parallel edges = co-occurrence weight —
# ``functions/pagerank.py`` counts parallel edges multiplicatively, so
# the multiset IS the weighted graph).  Node count is vocabulary-
# bounded; the edge multiset is linear in corpus tokens and every
# iteration is a keyed agg with map-side combine (the vocabulary-sized
# key space makes partial aggregation collapse the shuffle).

_TR_ITERS = 3
_TR_DAMPING = 0.85

_TR_STOP = "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS_EN) + "]"

_TR_EDGES_SQL = f"""
SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
  SELECT CASE WHEN f.d = 0 THEN p.a ELSE p.b END AS src,
         CASE WHEN f.d = 0 THEN p.b ELSE p.a END AS dst
  FROM (
    SELECT toks[i] AS a, toks[i + 1] AS b
    FROM (SELECT string_split(text, ' ') AS toks FROM documents) d,
         LATERAL (SELECT unnest(range(1, len(toks))) AS i) t
  ) p CROSS JOIN (VALUES (0), (1)) f(d)
  WHERE p.a <> p.b
    AND NOT list_contains({_TR_STOP}, p.a)
    AND NOT list_contains({_TR_STOP}, p.b)
) GROUP BY src, dst
"""


@query(
    "textrank_keywords",
    f"""
SELECT id AS word, pr_scaled
FROM ({weighted_pagerank_oracle_sql(_TR_EDGES_SQL, iterations=_TR_ITERS, damping=_TR_DAMPING)}) pr
""",
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords: damped PageRank over adjacent-token
    co-occurrence (stopwords and self-pairs dropped), {_TR_ITERS}
    power-method iterations, ranks scaled by N (mean 1.0 — O(1) values
    survive round-6 at any vocabulary size).  The corpus-sized pair
    multiset is collapsed to a vocabulary²-bounded WEIGHTED edge frame
    by one map-side-combined agg BEFORE the iterations
    (``functions/pagerank.py:weighted_pagerank``), so each power-method
    round joins the small graph, never the corpus.  The oracle replays
    the identical weighted fold as chained CTEs."""
    docs = _docs(spark, sf_dir)
    t = F.split(F.col("text"), " ")
    heads = F.slice(t, F.lit(1), F.size(t) - F.lit(1))
    tails = F.slice(t, F.lit(2), F.size(t) - F.lit(1))
    pairs = (
        docs.select(
            F.explode(
                F.zip_with(heads, tails, lambda x, y: F.struct(x.alias("a"), y.alias("b")))
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(
            (F.col("a") != F.col("b"))
            & ~F.col("a").isin(*tx.STOPWORDS_EN)
            & ~F.col("b").isin(*tx.STOPWORDS_EN)
        )
    )
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = weighted_pagerank(edges, iterations=_TR_ITERS, damping=_TR_DAMPING)
    n1 = ranks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return ranks.crossJoin(F.broadcast(n1)).select(
        F.col("id").alias("word"),
        F.round(F.col("pr") * F.col("n"), 6).alias("pr_scaled"),
    )


# --- embedding outlier scores (diagonal Mahalanobis) ---------------------------
#
# Score(x) = Σ_d (x_d − μ_d)² / σ²_d with per-dimension moments rounded
# at 6 (the proven embedding_dim_stats pinning).  The engine computes
# the 64-row moment frame once, folds it to a single (μ⃗, σ⃗²) row, and
# broadcasts it back — the scoring itself is a row-local JVM array fold
# (zip_with + aggregate, no UDF, no shuffle).  Under a χ²_d reference
# the score has mean d and variance 2d; the outlier cut is the
# d + 4·√(2d) tail bound.

_EMB_DIM = 64
_OUT_THR = _EMB_DIM + 4.0 * math.sqrt(2.0 * _EMB_DIM)

_OUTLIER_SQL = f"""
WITH x AS (SELECT vec_id, unnest(range(0, len(embedding))) AS dim, embedding
           FROM embeddings),
v AS (SELECT vec_id, dim, CAST(embedding[dim + 1] AS DOUBLE) AS val FROM x),
st AS (SELECT dim, round(avg(val), 6) AS mu, round(var_pop(val), 6) AS sg
       FROM v GROUP BY dim),
sv AS (SELECT list(mu ORDER BY dim) AS mu_arr, list(sg ORDER BY dim) AS sg_arr
       FROM st),
sc AS (
  SELECT vec_id,
         round(list_sum(list_transform(range(1, len(embedding) + 1),
           i -> CASE WHEN sg_arr[i] <> 0
                     THEN round((CAST(embedding[i] AS DOUBLE) - mu_arr[i])
                                * (CAST(embedding[i] AS DOUBLE) - mu_arr[i])
                                / sg_arr[i], 6)
                     ELSE 0.0 END)), 6) AS m2_score
  FROM embeddings CROSS JOIN sv
)
SELECT vec_id, m2_score, m2_score > {_OUT_THR!r} AS is_outlier FROM sc
"""


@query("embedding_outlier_scores", _OUTLIER_SQL)
def q_embedding_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis outlier score per embedding — the cheap
    anomaly scan run before any index/cluster build.  Per-term values
    are rounded at 6 BEFORE the fold (both engines fold the identical
    rounded doubles left-to-right), the final sum re-rounded at 6; the
    χ² tail threshold is a shared module constant."""
    emb = load_table(spark, sf_dir, "embeddings")
    stats = (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mu"),
            F.round(F.var_pop("v"), 6).alias("sg"),
        )
    )
    srow = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mu"))), lambda s: s["mu"]
        ).alias("mu_arr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "sg"))), lambda s: s["sg"]
        ).alias("sg_arr"),
    )
    diffs = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.col("mu_arr"),
        lambda x, m: (x - m) * (x - m),
    )
    terms = F.zip_with(
        diffs,
        F.col("sg_arr"),
        lambda d, s: F.when(s != F.lit(0.0), F.round(d / s, 6)).otherwise(F.lit(0.0)),
    )
    score = F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t), 6
    )
    return emb.crossJoin(F.broadcast(srow)).select(
        "vec_id",
        score.alias("m2_score"),
        (score > F.lit(_OUT_THR)).alias("is_outlier"),
    )


# --- snapshot diff (lakehouse table-diff operator) ------------------------------
#
# The CHANGE-feed primitive between two table snapshots: classify every
# primary key as added / removed / changed / unchanged, with a
# column-level change mask for the changed rows — what a Delta/Iceberg
# table diff emits.  Snapshot B is derived from snapshot A by a
# DETERMINISTIC mutation (modular key filters — identical expression on
# both engines), so the operator under test is the diff itself: one
# full-outer keyed join + null-safe column compares + one bounded agg.
# On real snapshots the derivation disappears and the diff runs as-is.

_DIFF_INS_SHIFT = 10_000_000_000  # beyond any fixture key space

_SNAPSHOT_DIFF_SQL = f"""
WITH a AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s
           FROM orders),
mod AS (SELECT k,
               CASE WHEN k % 31 = 0 THEN p + 10.0 ELSE p END AS p,
               CASE WHEN k % 41 = 0 THEN 'X' ELSE s END AS s
        FROM a WHERE k % 97 <> 0),
ins AS (SELECT k + {_DIFF_INS_SHIFT} AS k, p, s FROM a WHERE k % 113 = 0),
b AS (SELECT * FROM mod UNION ALL SELECT * FROM ins),
d AS (SELECT a.k IS NOT NULL AS in_a, b.k IS NOT NULL AS in_b,
             a.p IS DISTINCT FROM b.p AS p_ne,
             a.s IS DISTINCT FROM b.s AS s_ne
      FROM a FULL OUTER JOIN b ON a.k = b.k),
c AS (SELECT CASE WHEN NOT in_a THEN 'added'
                  WHEN NOT in_b THEN 'removed'
                  WHEN p_ne OR s_ne THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             CASE WHEN in_a AND in_b THEN
                    concat_ws(',',
                      CASE WHEN s_ne THEN 'o_orderstatus' END,
                      CASE WHEN p_ne THEN 'o_totalprice' END)
                  ELSE '' END AS changed_cols
      FROM d)
SELECT change_type, changed_cols, CAST(count(*) AS BIGINT) AS n_rows
FROM c GROUP BY change_type, changed_cols
"""


@query("snapshot_diff_orders", _SNAPSHOT_DIFF_SQL)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot diff: added/removed/changed/unchanged counts with
    a column-level change mask, via ONE full-outer join keyed on the
    primary key plus null-safe (`<=>`) column compares — no
    re-partitioning beyond the join's own shuffle, and the output agg
    is bounded by the (change_type × mask) domain."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
        F.col("o_orderstatus").alias("s"),
    )
    mod = a.where(F.col("k") % 97 != 0).select(
        "k",
        F.when(F.col("k") % 31 == 0, F.col("p") + F.lit(10.0))
        .otherwise(F.col("p"))
        .alias("p"),
        F.when(F.col("k") % 41 == 0, F.lit("X")).otherwise(F.col("s")).alias("s"),
    )
    ins = a.where(F.col("k") % 113 == 0).select(
        (F.col("k") + F.lit(_DIFF_INS_SHIFT)).alias("k"), "p", "s"
    )
    b = mod.unionByName(ins)
    d = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    in_a = F.col("a.k").isNotNull()
    in_b = F.col("b.k").isNotNull()
    p_ne = ~(F.col("a.p").eqNullSafe(F.col("b.p")))
    s_ne = ~(F.col("a.s").eqNullSafe(F.col("b.s")))
    change_type = (
        F.when(~in_a, F.lit("added"))
        .when(~in_b, F.lit("removed"))
        .when(p_ne | s_ne, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed_cols = F.when(
        in_a & in_b,
        F.concat_ws(
            ",",
            F.when(s_ne, F.lit("o_orderstatus")),
            F.when(p_ne, F.lit("o_totalprice")),
        ),
    ).otherwise(F.lit(""))
    return (
        d.select(change_type.alias("change_type"), changed_cols.alias("changed_cols"))
        .groupBy("change_type", "changed_cols")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# --- generalization ladder (Samarati lattice walk) ------------------------------
#
# For every record, the LEAST generalization of the time column
# (month → quarter → year → all-time) at which its QI equivalence class
# reaches k ≥ K_MIN — level 4 means even full time suppression leaves
# the class small (the record needs suppression).  Class sizes are
# monotone up the ladder, so the least level is well-defined.  Four
# QI-bounded class frames joined back onto the record stream (all
# broadcast-sized), then a bounded histogram.

_GEN_LADDER_SQL = f"""
WITH rec AS (
  SELECT c_nationkey AS n, c_mktsegment AS g,
         strftime(o_orderdate, '%Y-%m') AS m,
         CAST(year(o_orderdate) AS VARCHAR) || '-Q'
           || CAST(quarter(o_orderdate) AS VARCHAR) AS q,
         CAST(year(o_orderdate) AS VARCHAR) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
),
c0 AS (SELECT n, g, m, count(*) AS k0 FROM rec GROUP BY n, g, m),
c1 AS (SELECT n, g, q, count(*) AS k1 FROM rec GROUP BY n, g, q),
c2 AS (SELECT n, g, y, count(*) AS k2 FROM rec GROUP BY n, g, y),
c3 AS (SELECT n, g, count(*) AS k3 FROM rec GROUP BY n, g),
lv AS (
  SELECT CASE WHEN k0 >= {_K_MIN} THEN 0
              WHEN k1 >= {_K_MIN} THEN 1
              WHEN k2 >= {_K_MIN} THEN 2
              WHEN k3 >= {_K_MIN} THEN 3
              ELSE 4 END AS gen_level
  FROM rec
  JOIN c0 USING (n, g, m)
  JOIN c1 USING (n, g, q)
  JOIN c2 USING (n, g, y)
  JOIN c3 USING (n, g)
)
SELECT CAST(gen_level AS INT) AS gen_level,
       CAST(count(*) AS BIGINT) AS n_records
FROM lv GROUP BY gen_level
"""


@query("qi_generalization_levels", _GEN_LADDER_SQL)
def q_qi_generalization_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record generalization requirement under the Samarati ladder
    month→quarter→year→all-time: the histogram of the least time
    granularity at which each record's QI class reaches k ≥ 5
    (level 4 = suppress).  The anonymization-planning complement of
    k_anonymity_audit: it says how much generalization the release
    needs, not just whether it fails."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rec = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        F.col("c_nationkey").alias("n"),
        F.col("c_mktsegment").alias("g"),
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        F.concat(
            F.year("o_orderdate").cast("string"),
            F.lit("-Q"),
            F.quarter("o_orderdate").cast("string"),
        ).alias("q"),
        F.year("o_orderdate").cast("string").alias("y"),
    )
    c0 = rec.groupBy("n", "g", "m").agg(F.count(F.lit(1)).alias("k0"))
    c1 = rec.groupBy("n", "g", "q").agg(F.count(F.lit(1)).alias("k1"))
    c2 = rec.groupBy("n", "g", "y").agg(F.count(F.lit(1)).alias("k2"))
    c3 = rec.groupBy("n", "g").agg(F.count(F.lit(1)).alias("k3"))
    lv = (
        rec.join(c0, ["n", "g", "m"])
        .join(c1, ["n", "g", "q"])
        .join(c2, ["n", "g", "y"])
        .join(c3, ["n", "g"])
        .select(
            F.when(F.col("k0") >= _K_MIN, F.lit(0))
            .when(F.col("k1") >= _K_MIN, F.lit(1))
            .when(F.col("k2") >= _K_MIN, F.lit(2))
            .when(F.col("k3") >= _K_MIN, F.lit(3))
            .otherwise(F.lit(4))
            .cast("int")
            .alias("gen_level")
        )
    )
    return lv.groupBy("gen_level").agg(F.count(F.lit(1)).alias("n_records"))


# --- Jaro-Winkler record linkage ------------------------------------------------
#
# Entity resolution beyond edit distance: match a "dirty" feed (here a
# deterministic adjacent-char transposition of every distinct part
# name — the canonical data-entry error; on a real pipeline the dirty
# side is the second source) against the clean catalog with blocked
# Jaro-Winkler scoring.  The engine's Arrow-batched scorer is verified
# value-identical to DuckDB's native jaro_winkler_similarity (textbook
# p=0.1 / prefix ≤ 4 / boost 0.7 parameterization), so the oracle
# recomputes every score.

_JW_THRESHOLD = 0.9
_JW_BLOCK_PREFIX = 2

#: transposition point: 1-indexed p in [3, L-1] so the block prefix
#: (first 2 chars) is never touched — identical expression both engines
_JW_DIRTY_P = "3 + length(s) % (length(s) - 3)"
_JW_DIRTY_EXPR = (
    "substring(s, 1, p - 1) || substring(s, p + 1, 1)"
    " || substring(s, p, 1) || substring(s, p + 2)"
)

#: shared CTE chain (dirty-name derivation → blocking → JW scoring) —
#: the match query and the ER-clustering query embed the SAME text so
#: their semantics can never drift apart
_JW_MATCH_CTES = f"""clean AS (SELECT DISTINCT p_name AS c FROM part WHERE length(p_name) >= 4),
d0 AS (SELECT c AS s, {_JW_DIRTY_P} AS p FROM clean),
dirty AS (SELECT DISTINCT {_JW_DIRTY_EXPR} AS q FROM d0),
qb AS (SELECT q, substring(q, 1, {_JW_BLOCK_PREFIX}) AS blk FROM dirty),
cb AS (SELECT c, substring(c, 1, {_JW_BLOCK_PREFIX}) AS blk FROM clean),
kept AS (SELECT blk FROM cb GROUP BY blk
         HAVING count(*) <= {10_000}),
m AS (SELECT qb.q AS query_name, cb.c AS match_name,
             round(jaro_winkler_similarity(qb.q, cb.c), 6) AS jw
      FROM qb JOIN kept USING (blk) JOIN cb USING (blk))"""

_JW_MATCHES_SQL = f"""
WITH {_JW_MATCH_CTES}
SELECT query_name, match_name, jw
FROM m WHERE jw >= {_JW_THRESHOLD}
"""


@query("jw_name_matches", _JW_MATCHES_SQL)
def q_jw_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Jaro-Winkler entity resolution: every transposition-
    dirtied part name matched against the clean catalog within its
    2-char prefix block, kept at similarity ≥ 0.9.
    ``functions/fuzzy.py:jaro_winkler_pairs``: keyed block equi-join +
    Arrow-batched scorer on the candidate sliver; hot blocks dropped
    whole at the {10_000}-string cap (cap_baskets discipline)."""
    from depositaja_spark.functions.fuzzy import jaro_winkler_pairs

    part = load_table(spark, sf_dir, "part")
    clean = (
        part.select(F.col("p_name").alias("c"))
        .where(F.length("p_name") >= 4)
        .distinct()
    )
    dirty = (
        clean.select(F.col("c").alias("s"))
        .withColumn("p", F.expr(_JW_DIRTY_P))
        .selectExpr(f"{_JW_DIRTY_EXPR} AS q")
        .distinct()
    )
    return jaro_winkler_pairs(
        dirty,
        clean,
        q_col="q",
        c_col="c",
        threshold=_JW_THRESHOLD,
        block_prefix=_JW_BLOCK_PREFIX,
    )


# --- entropy l-diversity ----------------------------------------------------------
#
# Distinct-count l-diversity (l_diversity_audit) treats a 99%/1% class
# like a 50%/50% one; Shannon entropy of the sensitive distribution is
# the standard refinement (a class satisfies entropy-l-diversity when
# H ≥ ln l).  Per (distinct-count) l: how many classes, and their mean
# sensitive entropy — low avg entropy at high l exposes skewed classes
# the count metric calls diverse.

def _entropy_ldiv_sql() -> str:
    # per-class entropy from the (class, sensitive) cell counts; the
    # window-free formulation: H = ln k − (Σ c·ln c)/k on integer cells
    return f"""
WITH rec AS ({_QI_SQL}),
cell AS (SELECT c_nationkey, c_mktsegment, qi_month, o_orderpriority,
                CAST(count(*) AS BIGINT) AS c
         FROM rec GROUP BY 1, 2, 3, 4),
cls AS (
  SELECT c_nationkey, c_mktsegment, qi_month,
         CAST(count(*) AS BIGINT) AS l,
         CAST(sum(c) AS BIGINT) AS k,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
  FROM cell GROUP BY 1, 2, 3
)
SELECT CAST(l AS BIGINT) AS l_distinct,
       CAST(count(*) AS BIGINT) AS n_classes,
       round(avg(ln(CAST(k AS DOUBLE)) - slc / k), 4) AS avg_entropy
FROM cls GROUP BY l
"""


@query("entropy_l_diversity", _entropy_ldiv_sql())
def q_entropy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy refinement of the l-diversity audit: per distinct-count
    l, the mean Shannon entropy of the sensitive (priority)
    distribution inside those classes — H = ln k − (Σ c·ln c)/k from
    exact integer cell counts, so both engines evaluate the identical
    float expression.  Low avg entropy at high l flags skewed classes
    the count metric calls diverse."""
    cell = (
        _qi_records(spark, sf_dir)
        .groupBy("c_nationkey", "c_mktsegment", "qi_month", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cls = cell.groupBy("c_nationkey", "c_mktsegment", "qi_month").agg(
        F.count(F.lit(1)).alias("l"),
        F.sum("c").alias("k"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "slc"
        ),
    )
    h = F.log(F.col("k").cast("double")) - F.col("slc") / F.col("k")
    return cls.groupBy(F.col("l").alias("l_distinct")).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.round(F.avg(h), 4).alias("avg_entropy"),
    )


# --- entity clusters from the JW match graph ------------------------------------
#
# ER end-to-end: the blocked JW matches become edges of an entity graph
# (dirty ∪ clean names as vertices) and connected components turn
# pairwise links into entity groups — the closure step every record-
# linkage pipeline ends with (same role dedup_clusters plays for the
# document near-dup graph).  Output is the bounded cluster-size
# histogram; the oracle replays the closure as recursive-CTE
# reachability over the identical match CTEs.

_JW_CLUSTERS_SQL = f"""
WITH RECURSIVE {_JW_MATCH_CTES},
pairs AS (SELECT query_name, match_name FROM m WHERE jw >= {_JW_THRESHOLD}),
verts AS (SELECT q AS id FROM dirty UNION SELECT c FROM clean),
sym AS (SELECT query_name AS src, match_name AS dst FROM pairs
        UNION ALL
        SELECT match_name, query_name FROM pairs),
reach(id, lbl) AS (
  SELECT id, id FROM verts
  UNION
  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id
),
cl AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
       FROM cl GROUP BY cluster)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY cluster_size
"""


@query("jw_entity_clusters", _JW_CLUSTERS_SQL)
def q_jw_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity groups from the Jaro-Winkler match graph: connected
    components over (dirty ∪ clean) names linked at ≥ 0.9,
    reduced to the cluster-size histogram — pair detection → entity
    resolution closure, reusing the two-tier component engine
    (``functions/graph.py:connected_components``: driver union-find
    under the counted small-graph gate, pointer-jumping above)."""
    from depositaja_spark.functions.fuzzy import jaro_winkler_pairs
    from depositaja_spark.functions.graph import connected_components

    part = load_table(spark, sf_dir, "part")
    clean = (
        part.select(F.col("p_name").alias("c"))
        .where(F.length("p_name") >= 4)
        .distinct()
    )
    dirty = (
        clean.select(F.col("c").alias("s"))
        .withColumn("p", F.expr(_JW_DIRTY_P))
        .selectExpr(f"{_JW_DIRTY_EXPR} AS q")
        .distinct()
    )
    pairs = jaro_winkler_pairs(
        dirty,
        clean,
        q_col="q",
        c_col="c",
        threshold=_JW_THRESHOLD,
        block_prefix=_JW_BLOCK_PREFIX,
    )
    verts = dirty.select(F.col("q").alias("name")).unionByName(
        clean.select(F.col("c").alias("name"))
    ).distinct()
    cl = connected_components(
        verts,
        pairs,
        id_col="name",
        src_col="query_name",
        dst_col="match_name",
    )
    return (
        cl.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )
