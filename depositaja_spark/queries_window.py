"""Window-analytics queries: running totals, lag/lead deltas, ranking,
moving averages, correlated-subquery shapes — the analytic surface over
the wallet and TPC-H tables, each oracle-checked.

Determinism: window frames are total-ordered (unique tie-breaks), running
sums accumulate in frame order in both engines, and money values ride the
exact-decimal rules from functions/numeric.py where magnitudes are large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from depositaja_spark.operators import valid_deposits
from depositaja_spark.registry import DEPOSITS_CTE, query
from depositaja_spark.sources import deposits_from_events, load_table


def _deposits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return valid_deposits(deposits_from_events(load_table(spark, sf_dir, "events")))


@query(
    "running_balance",
    DEPOSITS_CTE
    + """
SELECT wallet_id, seq,
       round(sum(amount) OVER (PARTITION BY wallet_id ORDER BY seq
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
         AS running_balance
FROM deposits WHERE amount > 0
""",
)
def q_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-wallet balance after every deposit — the event-sourced
    view of A2 (what the reference's balance would read as of each event).
    One shuffle on the wallet; the frame accumulates in seq order."""
    w = W.partitionBy("wallet_id").orderBy("seq").rowsBetween(W.unboundedPreceding, 0)
    return _deposits(spark, sf_dir).select(
        "wallet_id", "seq", F.round(F.sum("amount").over(w), 4).alias("running_balance")
    )


@query(
    "deposit_deltas",
    DEPOSITS_CTE
    + """
SELECT wallet_id, seq,
       round(amount - lag(amount) OVER (PARTITION BY wallet_id ORDER BY seq), 4)
         AS delta_prev,
       CAST(floor(epoch(ts)) AS BIGINT)
         - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY wallet_id ORDER BY seq)
         AS gap_seconds
FROM deposits WHERE amount > 0
""",
)
def q_deposit_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytics: amount change and inter-deposit gap per wallet —
    the raw features of velocity-based fraud signals (the detector's
    rolling window is one such signal)."""
    w = W.partitionBy("wallet_id").orderBy("seq")
    d = _deposits(spark, sf_dir)
    return d.select(
        "wallet_id",
        "seq",
        F.round(F.col("amount") - F.lag("amount").over(w), 4).alias("delta_prev"),
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias(
            "gap_seconds"
        ),
    )


@query(
    "wallet_balance_ranks",
    DEPOSITS_CTE
    + """
, bal AS (
  SELECT wallet_id, round(sum(amount), 4) AS balance
  FROM deposits WHERE amount > 0 GROUP BY wallet_id
)
SELECT wallet_id, balance,
       CAST(rank()       OVER (ORDER BY balance DESC, wallet_id) AS INT) AS rnk,
       CAST(dense_rank() OVER (ORDER BY balance DESC, wallet_id) AS INT) AS dense_rnk,
       CAST(ntile(4)     OVER (ORDER BY balance DESC, wallet_id) AS INT) AS quartile
FROM bal
""",
)
def q_wallet_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ranking analytics over the balance table (rank/dense_rank/
    ntile with a total tie-broken order).  Global windows single-partition
    the data — fine for a post-aggregation table of wallets, never applied
    to raw events."""
    from depositaja_spark.operators import balance_per_wallet

    bal = balance_per_wallet(_deposits(spark, sf_dir), round_to=4)
    w = W.orderBy(F.desc("balance"), F.asc("wallet_id"))
    return bal.select(
        "wallet_id",
        "balance",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "daily_revenue_moving_avg",
    """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_unix,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT day_unix, revenue,
       round(avg(revenue) OVER (ORDER BY day_unix
                                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
         AS ma7
FROM daily
""",
)
def q_daily_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-row moving average over exact daily revenue — time-series
    smoothing with a bounded frame (state = 7 rows regardless of scale)."""
    from depositaja_spark.functions.numeric import dec, exact_sum

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
        .cast("long")
        .alias("day_unix")
    ).agg(exact_sum(dec("o_totalprice")).alias("revenue"))
    w = W.orderBy("day_unix").rowsBetween(-6, 0)
    return daily.select(
        "day_unix", "revenue", F.round(F.avg("revenue").over(w), 4).alias("ma7")
    )


@query(
    "seasonal_decompose_revenue",
    """
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_unix,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders GROUP BY 1
),
win AS (
  SELECT day_unix, rev_dec,
         (day_unix // 86400) % 7 AS weekday,
         CASE WHEN count(*) OVER w = 7 THEN sum(rev_dec) OVER w END AS t7
  FROM daily
  WINDOW w AS (ORDER BY day_unix ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT day_unix, rev_dec, weekday, t7,
         CASE WHEN t7 IS NOT NULL THEN 7 * rev_dec - t7 END AS d7
  FROM win
),
seas AS (
  SELECT weekday, CAST(sum(d7) AS DOUBLE) / (7 * count(d7)) AS seasonal
  FROM detr WHERE d7 IS NOT NULL GROUP BY 1
)
SELECT d.day_unix,
       round(CAST(d.rev_dec AS DOUBLE), 4) AS revenue,
       round(CAST(d.t7 AS DOUBLE) / 7, 4) AS trend,
       round(s.seasonal, 4) AS seasonal,
       round(CAST(d.rev_dec AS DOUBLE) - CAST(d.t7 AS DOUBLE) / 7 - s.seasonal, 4)
         AS residual
FROM detr d LEFT JOIN seas s USING (weekday)
""",
)
def q_seasonal_decompose_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue with a
    weekly period: trend = centered 7-day moving average (full windows
    only), seasonal = per-weekday mean of the detrended series, residual
    = the rest.  The daily series is bounded by the CALENDAR domain
    (~2,400 days for the order date range), not by sf — same scale
    argument as daily_revenue_moving_avg — so the ordered window is a
    bounded frame over a bounded frame count.

    Determinism discipline: every aggregate that feeds a float division
    is an EXACT decimal sum (trend×7 and detrended×7 stay in decimal;
    weekday means divide one exact sum by one exact count), so the
    double results are bit-identical across engines and partitionings —
    no float accumulation order anywhere.  Weekday is epoch-day mod 7,
    timezone-free on both engines."""
    from depositaja_spark.functions.numeric import dec

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
        .cast("long")
        .alias("day_unix")
    ).agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    w = W.orderBy("day_unix").rowsBetween(-3, 3)
    win = daily.select(
        "day_unix",
        "rev_dec",
        ((F.col("day_unix") / 86400).cast("long") % 7).alias("weekday"),
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.sum("rev_dec").over(w)
        ).alias("t7"),
    )
    detr = win.withColumn(
        "d7",
        F.when(
            F.col("t7").isNotNull(), F.lit(7) * F.col("rev_dec") - F.col("t7")
        ),
    )
    seas = (
        detr.filter(F.col("d7").isNotNull())
        .groupBy("weekday")
        .agg(
            (
                F.sum("d7").cast("double") / (F.lit(7) * F.count("d7"))
            ).alias("seasonal")
        )
    )
    trend = F.col("t7").cast("double") / 7
    return (
        detr.join(F.broadcast(seas), "weekday", "left")
        .select(
            "day_unix",
            F.round(F.col("rev_dec").cast("double"), 4).alias("revenue"),
            F.round(trend, 4).alias("trend"),
            F.round(F.col("seasonal"), 4).alias("seasonal"),
            F.round(
                F.col("rev_dec").cast("double") - trend - F.col("seasonal"), 4
            ).alias("residual"),
        )
    )


@query(
    "parts_above_brand_avg",
    """
SELECT p_partkey, p_brand, p_retailprice
FROM part p
WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                       WHERE p2.p_brand = p.p_brand)
""",
)
def q_parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (price above own-brand average),
    decorrelated into a per-brand AGGREGATE joined back — Catalyst's own
    rewrite of the subquery.  A brand-partitioned WINDOW would compute
    the same number but pull n/25 rows through each window task (brand
    count is fixed while part scales with sf — the hot-partition
    class); the aggregate is map-side combined to 25 rows and the join
    back is a broadcast at any scale.  Comparison on raw doubles is
    safe: both engines average the same per-brand sets."""
    p = load_table(spark, sf_dir, "part")
    brand_avg = p.groupBy("p_brand").agg(F.avg("p_retailprice").alias("brand_avg"))
    return (
        p.join(F.broadcast(brand_avg), "p_brand")
        .filter(F.col("p_retailprice") > F.col("brand_avg"))
        .select("p_partkey", "p_brand", "p_retailprice")
    )


@query(
    "sliding_window_values",
    """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 600 - j.j) * 600 AS window_start_unix,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events CROSS JOIN (VALUES (0), (1), (2)) j(j)
GROUP BY 1, 2
""",
)
def q_sliding_window_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 30-minute windows every 10 minutes via
    the built-in F.window(size, slide) — each event lands in size/slide=3
    windows, expanded map-side before one shuffle.  The streaming form is
    the same expression under a watermark.  Oracle replicates the window
    arithmetic with a 3-way offset cross join."""
    from depositaja_spark.functions.numeric import dec, exact_sum

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact_sum(dec("value")).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_unix"),
            "event_type",
            "n",
            "total_value",
        )
    )


_RANGE_6D = 6 * 86400  # seconds


@query(
    "revenue_range_frame_avg",
    f"""
WITH daily AS (
  SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_unix,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT day_unix, revenue,
       round(avg(revenue) OVER (ORDER BY day_unix
                                RANGE BETWEEN {_RANGE_6D} PRECEDING
                                          AND CURRENT ROW), 4) AS ma7_range
FROM daily
""",
)
def q_revenue_range_frame_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: the trailing-7-CALENDAR-day average
    (value-based frame over day_unix), which differs from the ROWS
    variant exactly on gap days — the frame shrinks instead of reaching
    further back.  The window runs over the already-aggregated daily
    frame (row count bounded by the data's time span, not its volume),
    the same scale argument as daily_revenue_moving_avg."""
    from depositaja_spark.functions.numeric import dec, exact_sum

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
        .cast("long")
        .alias("day_unix")
    ).agg(exact_sum(dec("o_totalprice")).alias("revenue"))
    w = W.orderBy("day_unix").rangeBetween(-_RANGE_6D, 0)
    return daily.select(
        "day_unix",
        "revenue",
        F.round(F.avg("revenue").over(w), 4).alias("ma7_range"),
    )


@query(
    "scd2_user_status",
    """
SELECT user_id,
       event_type AS status,
       CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_unix,
       CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))) AS BIGINT)
         AS valid_to_unix,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM events
""",
)
def q_scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension build: each user's event history
    becomes effective-dated status intervals — valid_from = the change
    timestamp, valid_to = the NEXT change (NULL on the open current
    row).  This is the standard warehouse shape for dimension history,
    and the interval table is what point-in-time (as-of) joins consume.

    Scale shape: one window partitioned by the high-cardinality user_id
    (never a hot key), total-ordered inside the partition by
    (ts, event_id) so concurrent changes get a deterministic interval
    chain.  One shuffle; no self-join — the lead() frame replaces the
    'join next version' formulation that would shuffle twice."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts").cast("long").alias("valid_from_unix"),
        nxt.cast("long").alias("valid_to_unix"),
        nxt.isNull().alias("is_current"),
    )


#: CDC cutoff: events strictly before are the "snapshot" load, at/after
#: are the incoming changelog.  Late in the fixture month so BOTH merge
#: branches are populated: users quiet after the cutoff carry their
#: snapshot row, active ones take the delta fold
_CDC_CUT_US = 1_706_616_000_000_000  # 2024-01-30T12:00:00Z


@query(
    "cdc_user_state",
    f"""
WITH ranked AS (
  SELECT user_id, event_type, value, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, value AS last_value, ts_us AS last_ts_us,
       CASE WHEN ts_us >= {_CDC_CUT_US} THEN 'delta' ELSE 'snapshot' END AS src
FROM ranked
WHERE rn = 1 AND event_type <> 'error'
""",
)
def q_cdc_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE (lakehouse upsert): the pre-cutoff events fold into a
    key-unique snapshot (tombstones already applied), the post-cutoff
    changelog folds to its final op per key, and ``changelog_merge``
    (functions/cdc.py) applies delta-wins / tombstone-deletes /
    snapshot-carries — the Delta/Iceberg ``MERGE INTO`` shape as a
    plan.  'error' events are the tombstone op; every other event
    upserts its value.

    The oracle is the ONE-PASS global fold: last-write-wins is
    associative, so fold(all) ≡ merge(fold(pre), fold(post)) — each
    driver run proves the staged merge preserves semantics (the salted-
    query oracle trick).  Scale shape: two keyed windows + one keyed
    full-outer join of key-unique frames; a bucketed snapshot makes the
    merge co-located."""
    from depositaja_spark.functions.cdc import changelog_merge, changelog_state

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    snapshot = (
        changelog_state(events.filter(us < _CDC_CUT_US))
        .filter(F.col("op") != "error")
        .select("user_id", "last_value", "last_ts_us")
    )
    delta = changelog_state(events.filter(us >= _CDC_CUT_US))
    return changelog_merge(snapshot, delta)


@query(
    "user_activity_streaks",
    """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
  FROM events
),
islands AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
)
SELECT user_id,
       CAST(count(*) AS INT) AS streak_days,
       CAST(min(day) * 86400 AS BIGINT) AS streak_start_unix
FROM islands
GROUP BY user_id, island
""",
)
def q_user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's runs of CONSECUTIVE active days,
    via the classic day − row_number() island key (constant within a
    consecutive run, jumps across a gap).  One distinct pass, one
    window partitioned by the high-cardinality user key over the
    already-deduped (user, day) frame, one aggregation — streak
    detection at corpus scale without any self-join."""
    events = load_table(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("long") / 86400).cast("long")
    days = events.select("user_id", day.alias("day")).distinct()
    w = W.partitionBy("user_id").orderBy("day")
    islands = days.withColumn("island", F.col("day") - F.row_number().over(w))
    return islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("int").alias("streak_days"),
        (F.min("day") * 86400).cast("long").alias("streak_start_unix"),
    ).drop("island")


@query(
    "cusum_value_shift",
    """
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE value IS NOT NULL
), hourly AS (
  SELECT event_type, t - t % 3600 AS hour_unix,
         CAST(sum(v) AS DECIMAL(18,2)) AS s_dec, count(*) AS n
  FROM ev GROUP BY 1, 2
), scalars AS (
  SELECT event_type, CAST(sum(v) AS DOUBLE) / count(*) AS mu
  FROM ev GROUP BY event_type
), z AS (
  SELECT h.event_type, h.hour_unix,
         (CAST(h.s_dec AS DOUBLE) / h.n) - 1.05 * s.mu AS z
  FROM hourly h JOIN scalars s ON h.event_type = s.event_type
), p AS (
  SELECT event_type, hour_unix,
         sum(z) OVER (PARTITION BY event_type ORDER BY hour_unix
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt
  FROM z
)
SELECT event_type, hour_unix,
       pt - least(CAST(0.0 AS DOUBLE),
                  min(pt) OVER (PARTITION BY event_type ORDER BY hour_unix
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         AS cusum
FROM p
""",
)
def q_cusum_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point statistic over each event type's
    hourly mean value — the classic sequential shift detector
    (Page 1954), rendered WITHOUT a sequential fold via its closed
    form: with z_t = x_t − (1.05·μ) (μ + 5% slack) and prefix sum
    P_t = Σ z, the recursion S_t = max(0, S_{t−1} + z_t) equals
    S_t = P_t − min(0, min_{j≤t} P_j).  Two ordered window passes over
    the HOURLY frame (bounded by the calendar domain, not by sf — the
    raw corpus sees only one keyed aggregation with map-side combine).

    Determinism: hourly means and μ divide exact DECIMAL sums by exact
    counts; z and both window folds then accumulate doubles in frame
    order with identical op order on both engines, so the raw doubles
    are bit-stable (no output round(), which diverges on decimal ties).
    """
    from depositaja_spark.functions.numeric import dec

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("ts").cast("long").alias("t"),
            dec("value").alias("v"),
        )
    )
    hourly = ev.groupBy(
        "event_type", (F.col("t") - F.col("t") % 3600).alias("hour_unix")
    ).agg(
        F.sum("v").cast("decimal(18,2)").alias("s_dec"),
        F.count(F.lit(1)).alias("n"),
    )
    scalars = ev.groupBy("event_type").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    z = hourly.join(F.broadcast(scalars), "event_type").select(
        "event_type",
        "hour_unix",
        (
            (F.col("s_dec").cast("double") / F.col("n"))
            - F.lit(1.05) * F.col("mu")
        ).alias("z"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_unix")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    p = z.select(
        "event_type", "hour_unix", F.sum("z").over(w).alias("pt")
    )
    return p.select(
        "event_type",
        "hour_unix",
        (
            F.col("pt") - F.least(F.lit(0.0), F.min("pt").over(w))
        ).alias("cusum"),
    )


@query(
    "hourly_value_acf",
    """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS hour_unix,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), lagged AS (
  SELECT event_type, x,
         lag(x, 1) OVER (PARTITION BY event_type ORDER BY hour_unix) AS x1,
         lag(x, 2) OVER (PARTITION BY event_type ORDER BY hour_unix) AS x2,
         lag(x, 3) OVER (PARTITION BY event_type ORDER BY hour_unix) AS x3
  FROM hourly
), m AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sxa, sum(x * x) AS sxx,
         sum(x * x1) AS sxy1, CAST(sum(CASE WHEN x1 IS NOT NULL THEN x END) AS DOUBLE) AS sx1,
         CAST(sum(x1) AS DOUBLE) AS sy1, count(x1) AS m1,
         sum(x * x2) AS sxy2, CAST(sum(CASE WHEN x2 IS NOT NULL THEN x END) AS DOUBLE) AS sx2,
         CAST(sum(x2) AS DOUBLE) AS sy2, count(x2) AS m2,
         sum(x * x3) AS sxy3, CAST(sum(CASE WHEN x3 IS NOT NULL THEN x END) AS DOUBLE) AS sx3,
         CAST(sum(x3) AS DOUBLE) AS sy3, count(x3) AS m3
  FROM lagged GROUP BY event_type
), f AS (
  SELECT event_type, n, CAST(n AS BIGINT) AS n_hours, sxa / n AS xbar,
         CAST(sxx AS DOUBLE) AS sxxd,
         CAST(sxy1 AS DOUBLE) AS sxy1d, sx1, sy1, m1,
         CAST(sxy2 AS DOUBLE) AS sxy2d, sx2, sy2, m2,
         CAST(sxy3 AS DOUBLE) AS sxy3d, sx3, sy3, m3
  FROM m
), g AS (
  SELECT event_type, n_hours, xbar,
         sxxd - CAST(n AS DOUBLE) * xbar * xbar AS den,
         ((sxy1d - xbar * sx1) - xbar * sy1) + CAST(m1 AS DOUBLE) * xbar * xbar AS num1, m1,
         ((sxy2d - xbar * sx2) - xbar * sy2) + CAST(m2 AS DOUBLE) * xbar * xbar AS num2, m2,
         ((sxy3d - xbar * sx3) - xbar * sy3) + CAST(m3 AS DOUBLE) * xbar * xbar AS num3, m3
  FROM f
)
SELECT event_type, n_hours,
       CASE WHEN m1 > 0 AND den <> 0 THEN num1 / den END AS acf_lag1,
       CASE WHEN m2 > 0 AND den <> 0 THEN num2 / den END AS acf_lag2,
       CASE WHEN m3 > 0 AND den <> 0 THEN num3 / den END AS acf_lag3
FROM g
""",
)
def q_hourly_value_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation (lags 1–3) of each event type's hourly total
    value — the seasonality / burst-memory diagnostic behind every
    time-series monitor.  The numerator Σ(x_t−x̄)(x_{t−k}−x̄) is
    EXPANDED into exact-decimal moments (Σx·x_k, Σx, Σx_k, m) so no
    float accumulates across rows: hourly totals are DECIMAL(18,2),
    products DECIMAL(37,4), and the only float arithmetic is a fixed
    op-order expression over per-type scalars — bit-stable on both
    engines regardless of partitioning.  One keyed agg over the raw
    corpus, one lag window over the bounded hourly frame."""
    from depositaja_spark.functions.numeric import dec

    hourly = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (
                F.col("ts").cast("long") - F.col("ts").cast("long") % 3600
            ).alias("hour_unix"),
        )
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    )
    w = W.partitionBy("event_type").orderBy("hour_unix")
    lagged = hourly.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sxa"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    ]
    for k in (1, 2, 3):
        xk = F.col(f"x{k}")
        aggs += [
            F.sum(F.col("x") * xk).alias(f"sxy{k}"),
            F.sum(F.when(xk.isNotNull(), F.col("x")))
            .cast("double")
            .alias(f"sx{k}"),
            F.sum(xk).cast("double").alias(f"sy{k}"),
            F.count(xk).alias(f"m{k}"),
        ]
    m = lagged.groupBy("event_type").agg(*aggs)
    xbar = F.col("sxa") / F.col("n")
    f = m.select(
        "event_type",
        F.col("n").alias("n_hours"),
        xbar.alias("xbar"),
        (
            F.col("sxx").cast("double")
            - F.col("n").cast("double") * xbar * xbar
        ).alias("den"),
        *[c for k in (1, 2, 3) for c in (
            (
                (
                    (F.col(f"sxy{k}").cast("double") - xbar * F.col(f"sx{k}"))
                    - xbar * F.col(f"sy{k}")
                )
                + F.col(f"m{k}").cast("double") * xbar * xbar
            ).alias(f"num{k}"),
            F.col(f"m{k}"),
        )],
    )
    return f.select(
        "event_type",
        "n_hours",
        *[
            F.when(
                (F.col(f"m{k}") > 0) & (F.col("den") != 0),
                F.col(f"num{k}") / F.col("den"),
            ).alias(f"acf_lag{k}")
            for k in (1, 2, 3)
        ],
    )


@query(
    "seasonal_naive_backtest",
    """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS hour_unix,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), a24 AS (
  SELECT a.event_type, sum(abs(a.x - b.x)) AS sae24, count(*) AS n24
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND b.hour_unix = a.hour_unix - 86400
  GROUP BY a.event_type
), a1 AS (
  SELECT a.event_type, sum(abs(a.x - b.x)) AS sae1, count(*) AS n1
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND b.hour_unix = a.hour_unix - 3600
  GROUP BY a.event_type
)
SELECT a24.event_type, n24 AS n_forecasts,
       CAST(sae24 AS DOUBLE) / n24 AS mae_seasonal,
       CASE WHEN n1 > 0 AND sae1 <> 0
            THEN (CAST(sae24 AS DOUBLE) / n24) / (CAST(sae1 AS DOUBLE) / n1)
       END AS mase
FROM a24 LEFT JOIN a1 ON a24.event_type = a1.event_type
""",
)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality backtest per event type: the seasonal-naive
    forecast (x̂_t = the value 24 h earlier) scored by MAE and by MASE —
    MAE scaled by the in-sample naive (lag-1 h) MAE, the scale-free
    skill measure (Hyndman–Koehler) that makes types with wildly
    different volumes comparable.  Both error legs are equi-joins of
    the hourly frame onto itself at an exact time shift (no windows, no
    gap-filling — hours missing the shifted observation simply don't
    score), and |errors| stay exact DECIMAL until one final division
    per leg.  Everything after the single corpus aggregation touches
    only calendar-bounded frames; types with no 24 h-apart pairs drop,
    types with no 1 h-apart pairs (or a constant series) get NULL MASE
    on both engines."""
    from depositaja_spark.functions.numeric import dec

    hourly = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (
                F.col("ts").cast("long") - F.col("ts").cast("long") % 3600
            ).alias("hour_unix"),
        )
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    )

    def leg(shift: int, sae: str, n: str) -> DataFrame:
        a = hourly.alias("a")
        b = hourly.select(
            F.col("event_type").alias("bt"),
            F.col("hour_unix").alias("bh"),
            F.col("x").alias("bx"),
        )
        return (
            a.join(
                b,
                (F.col("a.event_type") == F.col("bt"))
                & (F.col("bh") == F.col("a.hour_unix") - shift),
            )
            .groupBy(F.col("a.event_type").alias("event_type"))
            .agg(
                F.sum(F.abs(F.col("a.x") - F.col("bx"))).alias(sae),
                F.count(F.lit(1)).alias(n),
            )
        )

    a24 = leg(86400, "sae24", "n24")
    a1 = leg(3600, "sae1", "n1")
    mae24 = F.col("sae24").cast("double") / F.col("n24")
    mae1 = F.col("sae1").cast("double") / F.col("n1")
    return a24.join(F.broadcast(a1), "event_type", "left").select(
        "event_type",
        F.col("n24").alias("n_forecasts"),
        mae24.alias("mae_seasonal"),
        F.when((F.col("n1") > 0) & (F.col("sae1") != 0), mae24 / mae1).alias(
            "mase"
        ),
    )


@query(
    "theil_sen_hourly_trend",
    """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS hour_unix,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         CAST(b.x - a.x AS DOUBLE) / (b.hour_unix - a.hour_unix) * 3600 AS slope,
         a.hour_unix AS t1, b.hour_unix AS t2
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type
   AND b.hour_unix > a.hour_unix
   AND b.hour_unix <= a.hour_unix + 604800
), r AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type ORDER BY slope, t1, t2) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM pairs
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       slope AS trend_per_hour
FROM r WHERE rn = (n + 1) // 2
""",
)
def q_theil_sen_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the median of pairwise
    slopes over the hourly series, banded to pairs ≤7 days apart (the
    estimator keeps its breakdown point on any window; the band keeps
    the pair count at hours×168 — calendar-bounded and sf-INVARIANT,
    since more data densifies hours rather than adding them).  The
    median is the LOWER order statistic selected by row_number with a
    full (slope, t1, t2) tie-break — pure selection, no interpolation
    arithmetic to diverge across engines.  Slopes are exact-decimal
    differences over exact integer seconds, one division each."""
    from depositaja_spark.functions.numeric import dec
    from pyspark.sql import Window as W2

    hourly = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (
                F.col("ts").cast("long") - F.col("ts").cast("long") % 3600
            ).alias("hour_unix"),
        )
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    )
    b = hourly.select(
        F.col("event_type").alias("bt"),
        F.col("hour_unix").alias("t2"),
        F.col("x").alias("bx"),
    )
    pairs = hourly.join(
        b,
        (F.col("event_type") == F.col("bt"))
        & (F.col("t2") > F.col("hour_unix"))
        & (F.col("t2") <= F.col("hour_unix") + 604800),
    ).select(
        "event_type",
        (
            (F.col("bx") - F.col("x")).cast("double")
            / (F.col("t2") - F.col("hour_unix"))
            * 3600
        ).alias("slope"),
        F.col("hour_unix").alias("t1"),
        "t2",
    )
    w = W2.partitionBy("event_type").orderBy("slope", "t1", "t2")
    wn = W2.partitionBy("event_type")
    r = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.col("slope").alias("trend_per_hour"),
    )


@query(
    "hourly_crosscorr_leadlag",
    """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS hour_unix,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), lags(lag_hours) AS (VALUES (-2), (-1), (0), (1), (2)),
pairs AS (
  SELECT h1.event_type AS type_a, h2.event_type AS type_b, l.lag_hours,
         h1.x AS xa, h2.x AS xb
  FROM hourly h1 CROSS JOIN lags l
  JOIN hourly h2
    ON h2.hour_unix = h1.hour_unix - l.lag_hours * 3600
   AND h1.event_type < h2.event_type
), m AS (
  SELECT type_a, type_b, lag_hours, count(*) AS n,
         CAST(sum(xa) AS DOUBLE) AS sx, CAST(sum(xb) AS DOUBLE) AS sy,
         CAST(sum(xa * xb) AS DOUBLE) AS sxy,
         CAST(sum(xa * xa) AS DOUBLE) AS sxx,
         CAST(sum(xb * xb) AS DOUBLE) AS syy
  FROM pairs GROUP BY type_a, type_b, lag_hours
), g AS (
  SELECT type_a, type_b, lag_hours, n,
         CAST(n AS DOUBLE) * sxy - sx * sy AS num,
         CAST(n AS DOUBLE) * sxx - sx * sx AS denx,
         CAST(n AS DOUBLE) * syy - sy * sy AS deny
  FROM m
)
SELECT type_a, type_b, lag_hours, n AS n_pairs,
       CASE WHEN denx > 0 AND deny > 0
            THEN num / sqrt(denx * deny) END AS ccf
FROM g
""",
)
def q_hourly_crosscorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag cross-correlation between every pair of event types:
    Pearson r of type_a's hourly total against type_b's observed
    lag_hours EARLIER (−2…+2; a peak at positive lag means type_b
    LEADS type_a by that many hours) — the screen behind 'does click
    volume predict purchases an hour later?'.  All five
    moments are exact-DECIMAL sums over the matched pairs (the ACF
    expansion generalized to two series), finished by one fixed-op-
    order float expression; sqrt IS cross-engine safe (IEEE 754
    requires correct rounding — unlike log10, which benford avoids).
    One keyed corpus agg; the pair join matches on the shifted hour
    over the calendar-bounded frame with a 5-row broadcast lag dim,
    so the pair stage is |types|²-by-hours sized at any data volume.
    Zero-variance slices get NULL on both engines."""
    from depositaja_spark.functions.numeric import dec

    hourly = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (
                F.col("ts").cast("long") - F.col("ts").cast("long") % 3600
            ).alias("hour_unix"),
        )
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    )
    lags = spark.range(-2, 3).select(F.col("id").cast("int").alias("lag_hours"))
    h2 = hourly.select(
        F.col("event_type").alias("type_b"),
        F.col("hour_unix").alias("h2"),
        F.col("x").alias("xb"),
    )
    # 5-row broadcast lag dimension (CARTESIAN_OK-exempt: crossJoin of a
    # bounded literal range)
    pairs = (
        hourly.crossJoin(F.broadcast(lags))
        .join(
            h2,
            (F.col("h2") == F.col("hour_unix") - F.col("lag_hours") * 3600)
            & (F.col("event_type") < F.col("type_b")),
        )
        .select(
            F.col("event_type").alias("type_a"),
            "type_b",
            "lag_hours",
            F.col("x").alias("xa"),
            "xb",
        )
    )
    m = pairs.groupBy("type_a", "type_b", "lag_hours").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").cast("double").alias("sx"),
        F.sum("xb").cast("double").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).cast("double").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("double").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    g = m.select(
        "type_a",
        "type_b",
        "lag_hours",
        "n",
        (nd * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (nd * F.col("sxx") - F.col("sx") * F.col("sx")).alias("denx"),
        (nd * F.col("syy") - F.col("sy") * F.col("sy")).alias("deny"),
    )
    return g.select(
        "type_a",
        "type_b",
        "lag_hours",
        F.col("n").alias("n_pairs"),
        F.when(
            (F.col("denx") > 0) & (F.col("deny") > 0),
            F.col("num") / F.sqrt(F.col("denx") * F.col("deny")),
        ).alias("ccf"),
    )


@query(
    "mann_kendall_daily_trend",
    """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS day_unix,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.day_unix > a.day_unix
  GROUP BY 1
), n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
), ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS t
        FROM daily GROUP BY event_type, x)
  GROUP BY 1
), v AS (
  SELECT n.event_type, n.n_days, s.s_stat,
         CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS DOUBLE)
           / 18.0 AS var_s
  FROM n JOIN s USING (event_type) JOIN ties USING (event_type)
)
SELECT event_type, n_days, s_stat, round(var_s, 6) AS var_s,
       CASE WHEN var_s > 0 THEN round(
         (CAST(s_stat AS DOUBLE)
          - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
         / sqrt(var_s), 6) END AS z_stat,
       CASE WHEN var_s > 0 AND (CAST(s_stat AS DOUBLE)
              - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
              / sqrt(var_s) > 1.959964 THEN 'increasing'
            WHEN var_s > 0 AND (CAST(s_stat AS DOUBLE)
              - CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END)
              / sqrt(var_s) < -1.959964 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM v
""",
)
def q_mann_kendall_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall nonparametric trend test per event type over DAILY
    value totals — the distribution-free companion to the Theil–Sen
    slope (the classic pairing: MK decides WHETHER a monotone trend
    exists, Theil–Sen estimates HOW steep).  S = Σ_{i<j} sgn(x_j − x_i)
    is an exact integer (sgn compares exact DECIMAL daily totals, so no
    float enters the statistic); the tie-corrected variance
    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18 is integer arithmetic
    until ONE division by 18.0, and the continuity-corrected
    z = (S ∓ 1)/√Var(S) is two float ops (sqrt is IEEE-correctly-rounded
    → cross-engine safe).  The pair stage is the daily-frame self-join:
    days are CALENDAR-bounded (a decade is 3 650 rows per type →
    6.7 M pairs, trivial at any data volume — the reason this runs on
    daily totals; an hours-grain MK would band pairs like Theil–Sen).
    Zero-variance series (constant daily totals) return NULL z /
    'no_trend' on both engines."""
    from depositaja_spark.functions.numeric import dec

    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (
                F.col("ts").cast("long") - F.col("ts").cast("long") % 86400
            ).alias("day_unix"),
        )
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("day_unix").alias("bd"),
        F.col("x").alias("bx"),
    )
    s = (
        daily.join(
            b,
            (F.col("event_type") == F.col("bt")) & (F.col("bd") > F.col("day_unix")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("bx") > F.col("x"), 1)
                .when(F.col("bx") < F.col("x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    t = F.col("t")
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("event_type")
        .agg(F.sum(t * (t - 1) * (2 * t + 5)).cast("long").alias("tie_term"))
    )
    nd = F.col("n_days")
    v = (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (
                (nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")).cast("double")
                / 18.0
            ).alias("var_s"),
        )
    )
    sd = F.col("s_stat").cast("double")
    cc = (
        sd
        - F.when(F.col("s_stat") > 0, 1.0).when(F.col("s_stat") < 0, -1.0).otherwise(0.0)
    )
    # try_divide, not /: z is reused across three output expressions, so
    # codegen's common-subexpression elimination hoists it OUT of the
    # var_s > 0 guards and an ANSI session raises DIVIDE_BY_ZERO on a
    # constant series (sqrt(0) divisor).  NULL from try_divide never
    # surfaces: every consumer still sits behind the var_s > 0 guard.
    z = F.try_divide(cc, F.sqrt(F.col("var_s")))
    return v.select(
        "event_type",
        "n_days",
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.when(F.col("var_s") > 0, F.round(z, 6)).alias("z_stat"),
        F.when((F.col("var_s") > 0) & (z > 1.959964), "increasing")
        .when((F.col("var_s") > 0) & (z < -1.959964), "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


@query(
    "interarrival_burstiness",
    """
WITH seq AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             PARTITION BY user_id, event_type
             ORDER BY ts, event_id) AS gap
  FROM events
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(gap AS HUGEINT)) AS DOUBLE) AS s,
         CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS q
  FROM seq WHERE gap IS NOT NULL GROUP BY 1
), g AS (
  SELECT event_type, n, s / n AS mean_gap,
         sqrt((q - s * s / n) / n) AS sd_gap
  FROM m WHERE n > 0
)
SELECT event_type, n AS n_gaps,
       round(mean_gap, 6) AS mean_gap_sec,
       CASE WHEN mean_gap > 0 THEN round(sd_gap / mean_gap, 6) END AS cv_gap,
       CASE WHEN sd_gap + mean_gap > 0
            THEN round((sd_gap - mean_gap) / (sd_gap + mean_gap), 6)
       END AS burstiness
FROM g
""",
)
def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type burstiness of user inter-arrival times — the
    Goh–Barabási B = (σ−μ)/(σ+μ) over the gaps between a user's
    consecutive events of each type (B→−1 periodic, 0 Poisson, →+1
    bursty), plus the coefficient of variation.  The lag window
    partitions by (user_id, event_type) — HIGH-cardinality keys, so no
    hot window task exists at any scale — and the gaps are exact epoch-
    second integers: Σgap and Σgap² accumulate exactly (DECIMAL(38,0);
    gap² ≤ 7·10¹² per row) before the one fixed-order float finish
    (population σ via the moment identity, sqrt IEEE-safe).  One keyed
    window + one keyed agg; no joins."""
    t = F.col("ts").cast("long")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "event_type", (t - F.lag(t).over(w)).alias("gap")
    )
    m = (
        seq.filter(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("gap").cast("decimal(38,0)")).cast("double").alias("s"),
            # cast BEFORE the square (the oracle's CAST(gap AS HUGEINT) *
            # gap): a long*long square is the first thing to overflow at
            # century-scale gaps, a decimal one never does
            F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
            .cast("double")
            .alias("q"),
        )
    )
    nd = F.col("n").cast("double")
    g = m.filter(F.col("n") > 0).select(
        "event_type",
        "n",
        (F.col("s") / nd).alias("mean_gap"),
        F.sqrt((F.col("q") - F.col("s") * F.col("s") / nd) / nd).alias("sd_gap"),
    )
    return g.select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.round("mean_gap", 6).alias("mean_gap_sec"),
        F.when(
            F.col("mean_gap") > 0, F.round(F.col("sd_gap") / F.col("mean_gap"), 6)
        ).alias("cv_gap"),
        F.when(
            F.col("sd_gap") + F.col("mean_gap") > 0,
            F.round(
                (F.col("sd_gap") - F.col("mean_gap"))
                / (F.col("sd_gap") + F.col("mean_gap")),
                6,
            ),
        ).alias("burstiness"),
    )


@query(
    "spearman_daily_corr",
    """
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS day_unix,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), paired AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.day_unix, a.x AS xa, b.x AS xb
  FROM daily a JOIN daily b
    ON a.day_unix = b.day_unix AND a.event_type < b.event_type
), ranked AS (
  SELECT type_a, type_b,
         2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY xa)
           + count(*) OVER (PARTITION BY type_a, type_b, xa) - 1 AS ua,
         2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY xb)
           + count(*) OVER (PARTITION BY type_a, type_b, xb) - 1 AS ub
  FROM paired
), m AS (
  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ua) AS DOUBLE) AS sa, CAST(sum(ub) AS DOUBLE) AS sb,
         CAST(sum(ua * ua) AS DOUBLE) AS qa,
         CAST(sum(ub * ub) AS DOUBLE) AS qb,
         CAST(sum(ua * ub) AS DOUBLE) AS sab
  FROM ranked GROUP BY 1, 2
), g AS (
  SELECT type_a, type_b, n,
         CAST(n AS DOUBLE) * sab - sa * sb AS num,
         CAST(n AS DOUBLE) * qa - sa * sa AS dena,
         CAST(n AS DOUBLE) * qb - sb * sb AS denb
  FROM m
)
SELECT type_a, type_b, n AS n_days,
       CASE WHEN dena > 0 AND denb > 0
            THEN round(num / sqrt(dena * denb), 6) END AS rho
FROM g
""",
)
def q_spearman_daily_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between every event-type pair's DAILY
    value totals — the monotone-association screen that, unlike the
    Pearson CCF, is outlier-proof and scale-free (one viral day can't
    fabricate correlation).  Standard tie handling via AVERAGE ranks,
    kept exact by doubling: 2·avg_rank = 2·min_rank + ties − 1 is an
    INTEGER, so all five moments accumulate exactly (n ≤ days is
    calendar-bounded; 4n³ fits a long for multi-century spans) before
    the one fixed-op-order Pearson finish on doubles (sqrt IEEE-safe).
    Ranks are windows over the JOINED daily frame (aggregate below, 10
    pair partitions of ≤days rows); constant series → NULL rho on both
    engines."""
    from depositaja_spark.functions.numeric import dec

    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (
                F.col("ts").cast("long") - F.col("ts").cast("long") % 86400
            ).alias("day_unix"),
        )
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day_unix").alias("bd"),
        F.col("x").alias("xb"),
    )
    paired = daily.join(
        b,
        (F.col("day_unix") == F.col("bd")) & (F.col("event_type") < F.col("type_b")),
    ).select(
        F.col("event_type").alias("type_a"), "type_b", F.col("x").alias("xa"), "xb"
    )
    pw = ["type_a", "type_b"]
    ua = (
        2 * F.rank().over(W.partitionBy(*pw).orderBy("xa"))
        + F.count(F.lit(1)).over(W.partitionBy(*pw, "xa"))
        - 1
    )
    ub = (
        2 * F.rank().over(W.partitionBy(*pw).orderBy("xb"))
        + F.count(F.lit(1)).over(W.partitionBy(*pw, "xb"))
        - 1
    )
    ranked = paired.select(
        "type_a", "type_b", ua.cast("long").alias("ua"), ub.cast("long").alias("ub")
    )
    m = ranked.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ua").cast("double").alias("sa"),
        F.sum("ub").cast("double").alias("sb"),
        F.sum(F.col("ua") * F.col("ua")).cast("double").alias("qa"),
        F.sum(F.col("ub") * F.col("ub")).cast("double").alias("qb"),
        F.sum(F.col("ua") * F.col("ub")).cast("double").alias("sab"),
    )
    nd = F.col("n").cast("double")
    g = m.select(
        "type_a",
        "type_b",
        "n",
        (nd * F.col("sab") - F.col("sa") * F.col("sb")).alias("num"),
        (nd * F.col("qa") - F.col("sa") * F.col("sa")).alias("dena"),
        (nd * F.col("qb") - F.col("sb") * F.col("sb")).alias("denb"),
    )
    return g.select(
        "type_a",
        "type_b",
        F.col("n").alias("n_days"),
        F.when(
            (F.col("dena") > 0) & (F.col("denb") > 0),
            F.round(F.col("num") / F.sqrt(F.col("dena") * F.col("denb")), 6),
        ).alias("rho"),
    )


#: pinball-loss quantile levels as (tau, tau-1) DECIMAL literal pairs —
#: shared verbatim by both engines so the per-row loss stays exact
_PINBALL_TAUS = (("0.1", "-0.9"), ("0.5", "-0.5"), ("0.9", "-0.1"))


@query(
    "pinball_loss_backtest",
    """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - CAST(floor(epoch(ts)) AS BIGINT) % 3600 AS hour_unix,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
)
SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_forecasts,
"""
    + ",\n".join(
        f"""       CAST(sum(greatest(CAST({t} AS DECIMAL(2,1)) * (a.x - b.x),
                         CAST({tm} AS DECIMAL(2,1)) * (a.x - b.x)))
            AS DOUBLE) / count(*) AS pinball_q{t.replace('0.', '')}0"""
        for t, tm in _PINBALL_TAUS
    )
    + """
FROM hourly a JOIN hourly b
  ON a.event_type = b.event_type AND b.hour_unix = a.hour_unix - 86400
GROUP BY a.event_type
""",
)
def q_pinball_loss_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast backtest: the seasonal-naive forecast (the value
    24 h earlier) scored by pinball loss at tau = 0.1 / 0.5 / 0.9 per
    event type — the scoring rule quantile forecasts are graded by
    (tau=0.5 is half the MAE; the asymmetric taus reveal whether the
    forecast under- or over-covers the tails).  Each per-row loss
    max(tau*e, (tau-1)*e) is exact DECIMAL arithmetic on the exact
    DECIMAL error (the taus are shared 1-digit DECIMAL literals, never
    float 0.1), the sums stay exact, and the only float op is one final
    division per (type, tau).  Same equi-join shape at an exact time
    shift as seasonal_naive_backtest: no windows, no gap-filling, hours
    missing the 24 h-earlier observation simply don't score."""
    from depositaja_spark.functions.numeric import dec

    hourly = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            (
                F.col("ts").cast("long") - F.col("ts").cast("long") % 3600
            ).alias("hour_unix"),
        )
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("x"))
    )
    a = hourly.alias("a")
    b = hourly.select(
        F.col("event_type").alias("bt"),
        F.col("hour_unix").alias("bh"),
        F.col("x").alias("bx"),
    )
    err = F.col("a.x") - F.col("bx")
    losses = [
        (
            F.sum(
                F.greatest(
                    F.expr(f"CAST({t} AS DECIMAL(2,1))") * err,
                    F.expr(f"CAST({tm} AS DECIMAL(2,1))") * err,
                )
            ).cast("double")
            / F.count(F.lit(1))
        ).alias(f"pinball_q{t.replace('0.', '')}0")
        for t, tm in _PINBALL_TAUS
    ]
    return (
        a.join(
            b,
            (F.col("a.event_type") == F.col("bt"))
            & (F.col("bh") == F.col("a.hour_unix") - 86400),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_forecasts"), *losses)
    )
