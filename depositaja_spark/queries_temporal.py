"""Temporal-join and IVF-ANN queries (north-star extension surface).

* ``asof_last_click`` — purchase→click attribution: each purchase picks the
  same user's most recent click at or before it (backward as-of join).
  Oracle: explicit row_number-pinned as-of (tie-break matched to the engine).
* ``purchase_error_pairs`` — binned range join: purchase/error event pairs
  of the same user within ±10 minutes, exact microsecond boundaries.
* ``ann_topk_ivf`` — IVF-cell-pruned approximate nearest neighbors.

Timestamps compare as integer microseconds (``unix_micros`` /
``epoch_us``) on both sides, so the engines can never disagree at a
window boundary.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from depositaja_spark.functions import similarity as sim
from depositaja_spark.functions.temporal import asof_join, range_join_binned
from depositaja_spark.registry import query
from depositaja_spark.sources import load_table


# --- as-of join ---------------------------------------------------------------

# Explicit row_number formulation rather than DuckDB's native ASOF: the
# engine breaks duplicate right-timestamp ties deterministically
# (backward -> GREATEST payload), while native ASOF leaves tie selection
# unspecified — pinning the identical tie-break here removes the latent
# oracle flake if the fixture ever gains duplicate (user_id, ts) clicks.
_ASOF_SQL = """
WITH p AS (SELECT user_id, ts, event_id AS p_event_id, value AS amount
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, event_id AS click_event_id
           FROM events WHERE event_type = 'click'),
cand AS (
  SELECT p.user_id, p.p_event_id, p.ts AS p_ts, p.amount,
         c.click_event_id, c.ts AS c_ts,
         row_number() OVER (PARTITION BY p.user_id, p.p_event_id
                            ORDER BY c.ts DESC, c.click_event_id DESC) AS rn
  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
)
SELECT user_id, p_event_id,
       epoch_us(p_ts) AS p_ts_us,
       round(amount, 4) AS amount,
       click_event_id,
       epoch_us(c_ts) AS click_ts_us
FROM cand WHERE rn = 1
"""


@query("asof_last_click", _ASOF_SQL)
def q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (union-merge formulation, one shuffle): every
    purchase attributed to the user's latest click at or before it;
    purchases with no prior click keep nulls (left semantics)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id"), F.col("value").alias("amount")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(purchases, clicks, on="user_id", right_cols=["click_event_id"])
    return joined.select(
        "user_id",
        "p_event_id",
        F.unix_micros(F.col("ts")).alias("p_ts_us"),
        F.round("amount", 4).alias("amount"),
        F.col("click_event_id_asof").alias("click_event_id"),
        F.unix_micros(F.col("ts_asof")).alias("click_ts_us"),
    )


# Same pinned-tie-break rationale as _ASOF_SQL (forward -> SMALLEST
# payload at duplicate right timestamps, per functions/temporal.py).
_ASOF_FWD_SQL = """
WITH p AS (SELECT user_id, ts, event_id AS p_event_id, value AS amount
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts, event_id AS click_event_id
           FROM events WHERE event_type = 'click'),
cand AS (
  SELECT p.user_id, p.p_event_id, p.ts AS p_ts, p.amount,
         c.click_event_id, c.ts AS c_ts,
         row_number() OVER (PARTITION BY p.user_id, p.p_event_id
                            ORDER BY c.ts ASC, c.click_event_id ASC) AS rn
  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts
)
SELECT user_id, p_event_id,
       epoch_us(p_ts) AS p_ts_us,
       round(amount, 4) AS amount,
       click_event_id,
       epoch_us(c_ts) AS click_ts_us
FROM cand WHERE rn = 1
"""


@query("asof_next_click", _ASOF_FWD_SQL)
def q_asof_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: every purchase attributed to the user's
    earliest click at or after it (post-purchase behaviour attribution —
    pandas merge_asof(direction='forward')).  Same union-merge
    one-shuffle plan as the backward join, walked in descending
    timestamp order (functions/temporal.py:asof_join); the oracle pins
    the engine's duplicate-ts tie-break (smallest payload) explicitly
    via row_number instead of DuckDB's tie-unspecified native ASOF."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_event_id"), F.col("value").alias("amount")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", right_cols=["click_event_id"],
        direction="forward",
    )
    return joined.select(
        "user_id",
        "p_event_id",
        F.unix_micros(F.col("ts")).alias("p_ts_us"),
        F.round("amount", 4).alias("amount"),
        F.col("click_event_id_asof").alias("click_event_id"),
        F.unix_micros(F.col("ts_asof")).alias("click_ts_us"),
    )


# --- range join ---------------------------------------------------------------

_RANGE_S = 600

_RANGE_SQL = f"""
WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_event_id
           FROM events WHERE event_type = 'purchase'),
     e AS (SELECT user_id, ts AS e_ts, event_id AS e_event_id
           FROM events WHERE event_type = 'error')
SELECT p.user_id, p.p_event_id, e.e_event_id,
       epoch_us(e.e_ts) - epoch_us(p.p_ts) AS gap_us
FROM p JOIN e
  ON p.user_id = e.user_id
 AND epoch_us(e.e_ts) BETWEEN epoch_us(p.p_ts) - {_RANGE_S} * 1000000
                          AND epoch_us(p.p_ts) + {_RANGE_S} * 1000000
"""


@query("purchase_error_pairs", _RANGE_SQL)
def q_purchase_error_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join: purchase/error pairs of the same user within
    ±10 min.  The bin equi-join bounds candidates to overlapping bins
    (fan-out ≤ 2 bins/row) instead of exploding per-key histories."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_event_id")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts"), F.col("event_id").alias("e_event_id")
    )
    pairs = range_join_binned(
        purchases, errors, on="user_id", left_ts="p_ts", right_ts="e_ts",
        lower_s=-_RANGE_S, upper_s=_RANGE_S,
    )
    return pairs.select(
        "user_id",
        "p_event_id",
        "e_event_id",
        (F.unix_micros(F.col("e_ts")) - F.unix_micros(F.col("p_ts"))).alias("gap_us"),
    )


# --- IVF ANN ------------------------------------------------------------------

_Q_IDS = ", ".join(str(i) for i in sim.QUERY_IDS)
_C_IDS = ", ".join(str(i) for i in sim.CENTROID_IDS)

_COS = """
round(
  list_sum(list_transform(range(1, len({a}) + 1),
           i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(range(1, len({a}) + 1),
           i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, len({b}) + 1),
           i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))), 6)
"""

_IVF_SQL = f"""
WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
              WHERE vec_id IN ({_C_IDS})),
cell_scores AS (
  SELECT e.vec_id, c.cid, {_COS.format(a='e.embedding', b='c.cvec')} AS ccos
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, cid AS cell FROM cell_scores
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) = 1
),
probes AS (
  SELECT vec_id AS query_id, cid AS cell FROM cell_scores
  WHERE vec_id IN ({_Q_IDS})
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) <= {sim.NPROBE}
),
q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE vec_id IN ({_Q_IDS})),
c2 AS (SELECT e.vec_id AS cand_id, e.embedding AS cvec, a.cell
       FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id),
scored AS (
  SELECT p.query_id, c2.cand_id, {_COS.format(a='q.qvec', b='c2.cvec')} AS cos
  FROM c2 JOIN probes p USING (cell) JOIN q ON q.query_id = p.query_id
  WHERE c2.cand_id != p.query_id
)
SELECT query_id, cand_id, cos,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS INT) AS rank
FROM scored
QUALIFY rank <= {sim.TOP_K}
"""


@query("ann_topk_ivf", _IVF_SQL)
def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: corpus coarse-quantized to centroid cells (centroids =
    corpus rows {sim.CENTROID_IDS}); queries probe their {sim.NPROBE}
    nearest cells and score only those cells' members."""
    return sim.ann_topk_ivf(load_table(spark, sf_dir, "embeddings"))


# --- interval overlap: peak concurrency ---------------------------------------

#: boundary-sweep bucket width in SECONDS (the running sum orders by
#: epoch time, so buckets are time slices, not row counts): hourly slices
#: keep per-bucket sort tasks bounded by the session arrival rate while
#: the offsets frame stays span/3600 rows.
_SWEEP_BUCKET_SECONDS = 3600

_PEAK_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ids AS (
  -- same (ts, event_id) tie-break as the gaps window: with ts-only
  -- ordering, two same-instant events could nondeterministically land
  -- on either side of a session-opening flag and split one session in
  -- two, inflating the sweep
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
),
sess AS (
  SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS st,
         CAST(floor(epoch(max(ts))) AS BIGINT) + 1800 AS en
  FROM ids GROUP BY user_id, sid
),
bounds AS (
  SELECT st AS t, 1 AS delta, 0 AS dord FROM sess
  UNION ALL
  SELECT en AS t, -1 AS delta, 1 AS dord FROM sess
),
c AS (
  SELECT t, sum(delta) OVER (ORDER BY t, dord ROWS UNBOUNDED PRECEDING) AS cum
  FROM bounds
)
SELECT CAST((SELECT max(cum) FROM c) AS BIGINT) AS peak_concurrent,
       min(t) AS at_unix
FROM c WHERE cum = (SELECT max(cum) FROM c)
"""


@query("peak_concurrent_sessions", _PEAK_SQL)
def q_peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-open sessions (and the earliest
    instant it is reached) — the interval-overlap sweep line: sessions
    (F.session_window, 30-min gap, same definition session_window_stats
    oracles) become ±1 boundary events, a running sum over (time,
    starts-before-ends) counts open intervals, and the max of that sum
    is the peak.  No interval self-join — overlap counting via joins is
    quadratic in the hot hour; the sweep is one sort-shuffle.

    Scale: the global running sum uses the two-level bucket-offset
    decomposition (functions/windows.py:bucketed_running_sum) over
    hourly time slices — no single-task global window; the final max is
    a 1-row broadcast scalar joined back to pick the earliest peak
    instant (allow-listed 1-row nested-loop, tests/test_plan_audit.py).
    Peak and instant are both well-defined under boundary ties: +1s
    sort before -1s, so within a tie group the maximum is the group's
    closing value regardless of intra-group order."""
    from depositaja_spark.functions.windows import bucketed_running_sum

    ev = load_table(spark, sf_dir, "events")
    sess = ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w")).agg(
        F.lit(1).alias("_one")
    )
    iv = sess.select(
        F.unix_timestamp(F.col("w.start")).alias("st"),
        F.unix_timestamp(F.col("w.end")).alias("en"),
    )
    bounds = iv.select(
        F.col("st").alias("t"), F.lit(1).alias("delta"), F.lit(0).alias("dord")
    ).unionByName(
        iv.select(F.col("en").alias("t"), F.lit(-1).alias("delta"), F.lit(1).alias("dord"))
    )
    cum = bucketed_running_sum(
        bounds,
        [],
        "t",
        "delta",
        extra_order_cols=["dord"],
        bucket_width=_SWEEP_BUCKET_SECONDS,
    )
    peak = cum.agg(F.max("cum").alias("peak"))
    return (
        cum.join(F.broadcast(peak), F.col("cum") == F.col("peak"))
        .groupBy()
        .agg(
            F.max("peak").cast("long").alias("peak_concurrent"),
            F.min("t").alias("at_unix"),
        )
    )


# --- multi-touch attribution --------------------------------------------------

#: attribution lookback: clicks within 7 days at or before the purchase
_ATTR_LOOKBACK_S = 7 * 86400

_ATTR_SQL = f"""
WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_event_id
           FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id, ts AS c_ts, event_id AS click_event_id
           FROM events WHERE event_type = 'click'),
touch AS (
  SELECT p.user_id, p.p_event_id, c.click_event_id,
         epoch_us(c.c_ts) AS c_ts_us,
         CAST(row_number() OVER w AS BIGINT) AS pos,
         CAST(count(*) OVER (PARTITION BY p.p_event_id) AS BIGINT) AS m
  FROM p JOIN c
    ON p.user_id = c.user_id
   AND epoch_us(c.c_ts) BETWEEN epoch_us(p.p_ts) - CAST({_ATTR_LOOKBACK_S} AS BIGINT) * 1000000
                            AND epoch_us(p.p_ts)
  WINDOW w AS (PARTITION BY p.p_event_id ORDER BY c.c_ts, c.click_event_id)
)
SELECT user_id, p_event_id, click_event_id, pos,
       round(CASE WHEN m = 1 THEN 1.0
                  WHEN m = 2 THEN 0.5
                  WHEN pos = 1 OR pos = m THEN 0.4
                  ELSE 0.2 / (m - 2) END, 6) AS weight
FROM touch
"""


@query("attribution_weights", _ATTR_SQL)
def q_attribution_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: every purchase
    distributes credit over the user's clicks in a 7-day lookback —
    40% to the first touch, 40% to the last, 20% split across middles
    (1.0 / 0.5-0.5 for one/two touches).  Candidate pairs come from the
    binned range join (bounded fan-out per (user, week) — never
    |clicks|x|purchases| per user); positions from a window partitioned
    by PURCHASE (bounded by clicks-per-user-week, skew-safe at scale).
    Weights per purchase sum to 1 by construction — asserted in
    tests/test_temporal.py."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_event_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("click_event_id")
    )
    pairs = range_join_binned(
        purchases, clicks, on="user_id", left_ts="p_ts", right_ts="c_ts",
        lower_s=-_ATTR_LOOKBACK_S, upper_s=0,
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("p_event_id").orderBy("c_ts", "click_event_id")
    touch = pairs.select(
        "user_id",
        "p_event_id",
        "click_event_id",
        F.row_number().over(w).cast("long").alias("pos"),
        F.count(F.lit(1)).over(W.partitionBy("p_event_id")).cast("long").alias("m"),
    )
    weight = (
        F.when(F.col("m") == 1, F.lit(1.0))
        .when(F.col("m") == 2, F.lit(0.5))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("m")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("m") - 2))
    )
    return touch.select(
        "user_id", "p_event_id", "click_event_id", "pos",
        F.round(weight, 6).alias("weight"),
    )


# --- EWMA: per-key exponential smoothing --------------------------------------

# shared by the two smoothing queries: the fold inputs must be
# BIT-IDENTICAL between them (and between each Spark body and its SQL
# twin) because outputs ship as raw doubles — so the per-nation monthly
# revenue frame exists exactly ONCE in each language
_MONTHLY_REV_CTES = """
monthly AS (
  SELECT n.n_name AS nation,
         CAST(epoch(date_trunc('month', o.o_orderdate)) AS BIGINT) AS month_unix,
         round(sum(o.o_totalprice), 4) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
base AS (
  SELECT nation, month_unix, revenue,
         row_number() OVER (PARTITION BY nation ORDER BY month_unix) AS rn
  FROM monthly
)"""


def _monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
            .cast("long")
            .alias("month_unix"),
        )
        .agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    )


_EWMA_ALPHA = 0.3


@query(
    "ewma_monthly_revenue",
    f"""
WITH RECURSIVE
{_MONTHLY_REV_CTES},
f(nation, rn, month_unix, revenue, e) AS (
  SELECT nation, rn, month_unix, revenue, revenue FROM base WHERE rn = 1
  UNION ALL
  SELECT b.nation, b.rn, b.month_unix, b.revenue,
         {_EWMA_ALPHA} * b.revenue + {1.0 - _EWMA_ALPHA} * f.e
  FROM base b JOIN f ON b.nation = f.nation AND b.rn = f.rn + 1
)
SELECT nation, month_unix, revenue, e AS ewma FROM f
""",
)
def q_ewma_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly-revenue exponential smoothing (α={_EWMA_ALPHA})
    — the classic trend line every revenue dashboard draws.

    The sequential fold has no window-function form, so each nation's
    monthly series (BOUNDED by the fixed ~80-month date domain, not by
    sf) is folded array-side in one JVM ``aggregate`` expression
    (functions/temporal.py:ewma); the oracle replays the identical fold
    as a recursive CTE — the exact_detector_replay technique.  Upstream
    is one keyed aggregation over the orders⋈customer⋈nation join with
    the dimensions broadcast."""
    from depositaja_spark.functions.temporal import ewma

    monthly = _monthly_revenue(spark, sf_dir)
    out = ewma(monthly, ["nation"], "month_unix", "revenue", alpha=_EWMA_ALPHA)
    # raw double on both sides: the fold is bitwise identical across
    # engines, and an output round() is the only divergence risk (see
    # holt_revenue_forecast)
    return out.select("nation", "month_unix", "revenue", "ewma")


_HOLT_A, _HOLT_B = 0.5, 0.3


@query(
    "holt_revenue_forecast",
    f"""
WITH RECURSIVE
{_MONTHLY_REV_CTES},
f(nation, rn, month_unix, revenue, l, b) AS (
  SELECT nation, rn, month_unix, revenue,
         CAST(revenue AS DOUBLE), CAST(0.0 AS DOUBLE) FROM base WHERE rn = 1
  UNION ALL
  SELECT bb.nation, bb.rn, bb.month_unix, bb.revenue,
         {_HOLT_A} * bb.revenue + {1.0 - _HOLT_A} * (f.l + f.b),
         {_HOLT_B} * (({_HOLT_A} * bb.revenue + {1.0 - _HOLT_A} * (f.l + f.b)) - f.l)
           + {1.0 - _HOLT_B} * f.b
  FROM base bb JOIN f ON bb.nation = f.nation AND bb.rn = f.rn + 1
)
SELECT nation, month_unix, revenue,
       l AS level, b AS trend, l + b AS forecast
FROM f
""",
)
def q_holt_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing over per-nation monthly revenue
    (α={_HOLT_A}, β={_HOLT_B}) with the one-step-ahead forecast —
    EWMA's trend-aware sibling, same bounded-domain array fold
    (functions/temporal.py:holt_linear), same recursive-CTE oracle
    technique with a two-component accumulator."""
    from depositaja_spark.functions.temporal import holt_linear

    monthly = _monthly_revenue(spark, sf_dir)
    out = holt_linear(monthly, ["nation"], "month_unix", "revenue",
                      alpha=_HOLT_A, beta=_HOLT_B)
    # the fold is BITWISE identical across engines (same IEEE ops in the
    # same order on the same rounded inputs), so the outputs ship raw:
    # a round() here is the only thing that can diverge (Spark HALF_UP
    # on the decimal string vs DuckDB float rounding — a knife-edge on
    # tie values like x.xxxx5)
    return out.select("nation", "month_unix", "revenue", "level", "trend", "forecast")


# --- OHLC downsampling ---------------------------------------------------------

_OHLC_SQL = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 * 3600 AS hour_unix,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         event_id, value
  FROM events WHERE value IS NOT NULL
),
r AS (
  SELECT event_type, hour_unix, value,
         row_number() OVER w AS rn_open,
         row_number() OVER (PARTITION BY event_type, hour_unix
                            ORDER BY ts_s DESC, event_id DESC) AS rn_close
  FROM e
  WINDOW w AS (PARTITION BY event_type, hour_unix ORDER BY ts_s, event_id)
)
SELECT event_type, hour_unix,
       round(max(CASE WHEN rn_open = 1 THEN value END), 4) AS open,
       round(max(value), 4) AS high,
       round(min(value), 4) AS low,
       round(max(CASE WHEN rn_close = 1 THEN value END), 4) AS close,
       CAST(count(*) AS BIGINT) AS volume
FROM r GROUP BY 1, 2
"""


@query("hourly_value_ohlc", _OHLC_SQL)
def q_hourly_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close/volume) downsampling of event values
    per type per hour — the candlestick resample every time-series store
    ships.  Open/close are ``min_by``/``max_by`` over the (ts, event_id)
    struct (a unique total order, so ties are impossible and both
    engines pick the identical row — the oracle uses the row_number
    twin); high/low/volume are plain aggregates.  ONE keyed aggregation
    with map-side combine, no window over the raw events, no self-join —
    the shape that survives a 100 TB event stream."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ts_s = F.col("ts").cast("long")
    key = F.struct(ts_s.alias("t"), F.col("event_id").alias("e"))
    return (
        ev.select(
            "event_type",
            (ts_s - ts_s % 3600).alias("hour_unix"),
            "value",
            key.alias("k"),
        )
        .groupBy("event_type", "hour_unix")
        .agg(
            F.round(F.min_by("value", F.col("k")), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", F.col("k")), 4).alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
    )


@query(
    "user_value_twap",
    """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL
), seq AS (
  SELECT user_id, v,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dur
  FROM ev
)
SELECT user_id,
       CAST(sum(v * dur) AS DOUBLE) / CAST(sum(dur) AS BIGINT) AS twap,
       CAST(sum(dur) AS BIGINT) AS span_seconds
FROM seq WHERE dur IS NOT NULL
GROUP BY user_id HAVING sum(dur) > 0
""",
)
def q_user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user over an IRREGULAR event
    series — each observation holds until the user's next event, so the
    integral of the step function divided by the covered span (the TWAP
    every market-data store ships; the row-mean would over-weight
    bursts).  One lead() window partitioned by the HIGH-cardinality
    user key (ordered by the unique (ts, event_id) pair — no tie
    ambiguity), one keyed agg: durations are exact BIGINT seconds,
    value×duration stays DECIMAL, and a single final double division is
    the only float op.  Same-second runs get zero weight (harmless
    exact zeros); single-event users have no covered span and drop via
    HAVING on both engines."""
    from depositaja_spark.functions.numeric import dec
    from pyspark.sql import Window as W

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("long").alias("t"),
            "event_id",
            dec("value").alias("v"),
        )
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    seq = ev.select(
        "user_id",
        "v",
        (F.lead("t").over(w) - F.col("t")).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    return (
        seq.groupBy("user_id")
        .agg(
            (
                F.sum(F.col("v") * F.col("dur")).cast("double")
                / F.sum("dur")
            ).alias("twap"),
            F.sum("dur").alias("span_seconds"),
        )
        .filter(F.col("span_seconds") > 0)
    )


# --- ANN quality: IVF recall vs the exact baseline ----------------------------

_BRUTE_SQL = f"""
SELECT query_id, cand_id FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY {_COS.format(a='q.embedding', b='c.embedding')} DESC,
                    c.vec_id) AS rank
  FROM embeddings c
  CROSS JOIN (SELECT vec_id, embedding FROM embeddings
              WHERE vec_id IN ({_Q_IDS})) q
  WHERE c.vec_id != q.vec_id
) WHERE rank <= {sim.TOP_K}
"""


@query(
    "ann_recall_ivf",
    f"""
WITH ivf AS ({_IVF_SQL}),
brute AS ({_BRUTE_SQL})
SELECT b.query_id,
       CAST(count(ivf.cand_id) AS BIGINT) AS n_hits,
       round(CAST(count(ivf.cand_id) AS DOUBLE) / {sim.TOP_K}, 6)
         AS recall_at_k
FROM brute b
LEFT JOIN ivf ON b.query_id = ivf.query_id AND b.cand_id = ivf.cand_id
GROUP BY b.query_id
""",
)
def q_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{sim.TOP_K} of the IVF-pruned ANN against the exact brute
    top-{sim.TOP_K} — THE standard ANN quality metric (the number every
    index benchmark reports; here it quantifies exactly what nprobe
    cell pruning costs).  Both pipelines already exist as registered
    operators; this composes them: one keyed join of two k-bounded
    per-query result frames + a per-query count — the metric layer adds
    no corpus-sized work beyond the two retrieval plans themselves.
    Complements retrieval_eval_at_k (which judges the EXACT ranking
    against labels; this judges the APPROXIMATE index against the exact
    ranking)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(sim.QUERY_IDS))
    brute = sim.cosine_topk(emb, queries, k=sim.TOP_K).select(
        "query_id", "cand_id"
    )
    ivf = sim.ann_topk_ivf(emb).select(
        F.col("query_id").alias("iq"), F.col("cand_id").alias("ic")
    )
    j = brute.join(
        ivf,
        (F.col("query_id") == F.col("iq")) & (F.col("cand_id") == F.col("ic")),
        "left",
    )
    return j.groupBy("query_id").agg(
        F.count("ic").cast("long").alias("n_hits"),
        F.round(F.count("ic").cast("double") / sim.TOP_K, 6).alias(
            "recall_at_k"
        ),
    )


# --- Holt-Winters triple-exponential smoothing (weekly seasonality) ------------

_HW_A, _HW_B, _HW_G = 0.3, 0.1, 0.2
_HW_PERIOD = 7

#: l_t inlined into b_t / s_t exactly as the engine's fold inlines it
_HW_L = (
    f"{_HW_A} * (bb.v - f.slist[bb.rn - {_HW_PERIOD}])"
    f" + {1.0 - _HW_A} * (f.l + f.b)"
)


@query(
    "holt_winters_daily_value",
    f"""
WITH RECURSIVE
daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
              AS DOUBLE) AS v
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
base AS (
  SELECT event_type, day, v,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM daily
),
f(event_type, rn, day, v, l, b, s, slist) AS (
  SELECT event_type, rn, day, v,
         CAST(v AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
         [CAST(0.0 AS DOUBLE)]
  FROM base WHERE rn = 1
  UNION ALL
  SELECT bb.event_type, bb.rn, bb.day, bb.v,
         CASE WHEN bb.rn <= {_HW_PERIOD} THEN CAST(bb.v AS DOUBLE)
              ELSE {_HW_L} END,
         CASE WHEN bb.rn <= {_HW_PERIOD} THEN 0.0
              ELSE {_HW_B} * (({_HW_L}) - f.l) + {1.0 - _HW_B} * f.b END,
         CASE WHEN bb.rn <= {_HW_PERIOD} THEN 0.0
              ELSE {_HW_G} * (bb.v - ({_HW_L}))
                   + {1.0 - _HW_G} * f.slist[bb.rn - {_HW_PERIOD}] END,
         list_append(f.slist,
           CASE WHEN bb.rn <= {_HW_PERIOD} THEN 0.0
                ELSE {_HW_G} * (bb.v - ({_HW_L}))
                     + {1.0 - _HW_G} * f.slist[bb.rn - {_HW_PERIOD}] END)
  FROM base bb JOIN f ON bb.event_type = f.event_type AND bb.rn = f.rn + 1
)
SELECT event_type, CAST(day AS BIGINT) AS day, v AS value,
       l AS level, b AS trend, s AS seasonal,
       l + b + coalesce(lag(s, {_HW_PERIOD - 1})
                 OVER (PARTITION BY event_type ORDER BY day), 0.0)
         AS forecast
FROM f
""",
)
def q_holt_winters_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (triple-exponential) smoothing of each
    type's daily value series with weekly seasonality (m={_HW_PERIOD},
    α={_HW_A}, β={_HW_B}, γ={_HW_G}) — completing the classical
    smoothing ladder EWMA → Holt → Holt-Winters with the level/trend/
    seasonal decomposition and the one-step-ahead forecast.  Same
    bounded-domain array-fold shape
    (functions/temporal.py:holt_winters_additive) and the same
    recursive-CTE oracle technique, extended with a seasonal-history
    list column so the CTE can reach s_(t−m); the forecast's seasonal
    term is a LAG over the folded frame in BOTH engines.  Outputs ship
    raw doubles (the fold is bitwise identical across engines; an
    output round() is the only divergence risk)."""
    from depositaja_spark.functions.temporal import holt_winters_additive

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day"),
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("v")
    )
    out = holt_winters_additive(
        daily, ["event_type"], "day", "v",
        alpha=_HW_A, beta=_HW_B, gamma=_HW_G, period=_HW_PERIOD,
    )
    return out.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("v").alias("value"),
        "level",
        "trend",
        "seasonal",
        "forecast",
    )


# --- spectral periodogram at candidate seasonal periods ---------------------------
#
# Seasonality detection by direct DFT projection: for each candidate
# period P, the fraction of the daily series' variance captured by the
# (cos, sin) pair at frequency 1/P.  Phases are computed from day % P
# (small integers) so both engines' cos/sin see identical tiny
# arguments — large-argument range reduction is where libm and JVM
# Math diverge beyond round-6.  The period dimension is a 3-row
# broadcast literal crossed onto the calendar-bounded daily frame.

_PGRAM_PERIODS = (7, 14, 30)

_PGRAM_SQL = f"""
WITH daily AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) / count(*) AS mu,
             CAST(sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS DOUBLE)
               - count(*) * (CAST(sum(x) AS DOUBLE) / count(*))
                          * (CAST(sum(x) AS DOUBLE) / count(*)) AS ss
      FROM daily),
per(p) AS (VALUES ({_PGRAM_PERIODS[0]}), ({_PGRAM_PERIODS[1]}), ({_PGRAM_PERIODS[2]})),
proj AS (
  SELECT per.p,
         sum((CAST(d.x AS DOUBLE) - m.mu) * cos(2 * pi() * (d.day % per.p) / per.p)) AS c,
         sum((CAST(d.x AS DOUBLE) - m.mu) * sin(2 * pi() * (d.day % per.p) / per.p)) AS s,
         max(m.n) AS n, max(m.ss) AS ss
  FROM daily d CROSS JOIN m CROSS JOIN per
  GROUP BY per.p
)
SELECT CAST(p AS INT) AS period,
       CAST(n AS BIGINT) AS n_days,
       round(2.0 * (c * c + s * s) / (n * ss), 6) AS variance_frac
FROM proj WHERE ss > 0
"""


@query("daily_value_periodogram", _PGRAM_SQL)
def q_daily_value_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance fraction at candidate seasonal periods (7, 14, 30)
    via direct DFT projection of the centered daily value series — the
    'is there weekly seasonality' detector feeding the Holt-Winters /
    seasonal-naive tier.  One exact-DECIMAL daily agg, one 1-row moment
    frame, one 3-row period literal crossed onto the bounded day frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("value").isNotNull())
        .groupBy(
            F.floor(F.col("ts").cast("long") / 86400).cast("long").alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
    )
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("mu"),
        (
            F.sum(F.col("x").cast("double") * F.col("x").cast("double"))
            - F.count(F.lit(1))
            * (F.sum("x").cast("double") / F.count(F.lit(1)))
            * (F.sum("x").cast("double") / F.count(F.lit(1)))
        ).alias("ss"),
    )
    per = daily.sparkSession.createDataFrame(
        [(p,) for p in _PGRAM_PERIODS], "p int"
    )
    phase = (
        F.lit(2.0) * F.lit(math.pi) * (F.col("day") % F.col("p")) / F.col("p")
    )
    xc = (F.col("x").cast("double") - F.col("mu"))
    proj = (
        daily.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(per))
        .groupBy("p")
        .agg(
            F.sum(xc * F.cos(phase)).alias("c"),
            F.sum(xc * F.sin(phase)).alias("s"),
            F.max("n").alias("n"),
            F.max("ss").alias("ss"),
        )
    )
    return proj.where(F.col("ss") > 0).select(
        F.col("p").cast("int").alias("period"),
        F.col("n").cast("long").alias("n_days"),
        F.round(
            F.lit(2.0)
            * (F.col("c") * F.col("c") + F.col("s") * F.col("s"))
            / (F.col("n") * F.col("ss")),
            6,
        ).alias("variance_frac"),
    )
