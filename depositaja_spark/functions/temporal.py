"""Temporal join operators Spark lacks as built-ins: as-of join, range join.

Both are staples of event/feature pipelines (point-in-time-correct feature
lookup, nearby-event correlation) and neither exists as a native DataFrame
operator, so each is re-expressed as a composition of built-in ops chosen
for its scale behavior:

* as-of join   — the union-merge formulation: tag both sides, union, one
  shuffle on the key, one per-key sort, ``last(ignorenulls)`` window to
  carry the most recent right-side row forward.  Cost is a single exchange
  of |L|+|R| rows — no range-condition blowup, no per-row binary search,
  and AQE handles key skew.  This is how production engines implement
  merge as-of joins.
* range join   — the binned form: bucket both sides by time bin of width =
  the range span, equi-join on (key, bin) with each left row probing its
  candidate bins, then apply the exact range predicate.  Turns an
  inequality join (O(|L|·|R|) nested loop in the worst case) into a keyed
  hash join with bounded fan-out 2–3 bins per row.

Reference scope note: the reference (dinorain/depositaja) has no joins
besides the keyed lookup (SURVEY.md §2.4) — these operators are part of
the engine's north-star extension surface, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_s: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row picks, per ``on`` key, the right row
    with the greatest ``right_ts`` ≤ ``left_ts`` (``direction=
    "backward"``, the default) or the smallest ``right_ts`` ≥
    ``left_ts`` (``direction="forward"`` — pandas merge_asof's
    direction vocabulary).  Inclusive ties match; unmatched left rows
    keep null right columns.  Forward is the same union-merge walked in
    DESCENDING timestamp order — identical one-shuffle economics; on
    duplicate right timestamps backward resolves to the greatest
    payload, forward to the smallest (both deterministic).

    Implementation: union-merge.  Right rows are tagged side=0, left rows
    side=1; one window per key ordered by (ts, side, …) carries the last
    non-null right values forward, so at equal timestamps the right row is
    already visible to the left row (inclusive semantics).  If several
    right rows share a timestamp the one latest in the (deterministic)
    ``right_ts``-then-column order wins.

    ``tolerance_s`` optionally voids matches older than the given number
    of seconds (pandas ``merge_asof(tolerance=...)`` analog) — applied as
    a post-filter that nulls the right columns, keeping the plan shape
    identical.

    Scale: ONE shuffle on ``on`` + per-partition sort; contrast with the
    naive formulation (range join + row_number) which explodes every left
    row against its whole right history before ranking.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        F.col(right_ts).alias("_r_ts"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # order right rows before left at equal ts (inclusive match), and by the
    # right payload columns last so duplicate-ts right rows resolve
    # deterministically to the greatest payload
    ts_ord = F.col("_ats").desc() if fwd else F.col("_ats").asc()
    pay_ord = [
        (F.col(f"_r_{c}").desc() if fwd else F.col(f"_r_{c}").asc())
        for c in right_cols
    ]
    w = (
        Window.partitionBy(on)
        .orderBy(ts_ord, F.col("_side").asc(), *pay_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}") for c in right_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_m_ts"),
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        if fwd:
            stale = F.col("_m_ts") > F.col("_ats") + F.expr(
                f"INTERVAL {tolerance_s} SECONDS"
            )
        else:
            stale = F.col("_m_ts") < F.col("_ats") - F.expr(
                f"INTERVAL {tolerance_s} SECONDS"
            )
        out = out.select(
            on,
            "_ats",
            *[c for c in left.columns if c != on],
            *[F.when(stale, F.lit(None)).otherwise(F.col(f"_m_{c}")).alias(f"_m_{c}") for c in right_cols],
            F.when(stale, F.lit(None)).otherwise(F.col("_m_ts")).alias("_m_ts"),
        )
    return out.select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        *[F.col(f"_m_{c}").alias(f"{c}_asof") for c in right_cols],
        F.col("_m_ts").alias(f"{right_ts}_asof"),
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -600,
    upper_s: int = 600,
) -> DataFrame:
    """Range join: all (left, right) pairs with the same ``on`` key and
    ``right_ts`` ∈ [left_ts + lower_s, left_ts + upper_s] seconds.

    Implementation: bin both sides at width = span = upper−lower; each left
    row probes the bins its window can overlap (⌈span/width⌉+1 = 2
    consecutive bins after shifting by ``lower_s``), the join is a plain
    equi-join on (key, bin), and the exact BETWEEN predicate filters the
    survivors.  Catalyst would otherwise plan key-equi + time-inequality
    as a hash join on the key alone with a post-filter — correct, but the
    per-key fan-out is |L_k|·|R_k|; binning bounds the candidates to the
    rows in overlapping bins, which is what survives a 100× scale-up on
    long-history keys.
    """
    overlap = {c for c in left.columns if c != on} & {c for c in right.columns if c != on}
    if overlap:
        raise ValueError(f"rename overlapping non-key columns before joining: {sorted(overlap)}")
    # all arithmetic in integer epoch microseconds — exact at the ±window
    # boundary and identical to what a SQL oracle computes with epoch_us();
    # a double-seconds cast could round differently on the two sides
    span_us = (upper_s - lower_s) * 1_000_000
    lower_us = lower_s * 1_000_000
    upper_us = upper_s * 1_000_000
    l_epoch = F.unix_micros(F.col(left_ts))
    r_epoch = F.unix_micros(F.col(right_ts))

    r_binned = right.select(
        F.col(on),
        *[F.col(c) for c in right.columns if c != on],
        F.floor(r_epoch / span_us).cast("long").alias("_bin"),
    )
    # left probes the bin of (ts+lower) and of (ts+upper): every right bin
    # that can overlap [ts+lower, ts+upper]
    l_binned = left.select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((l_epoch + lower_us) / span_us).cast("long"),
                    F.floor((l_epoch + upper_us) / span_us).cast("long"),
                )
            )
        ).alias("_bin"),
    )
    lo = F.unix_micros(F.col(left_ts)) + lower_us
    hi = F.unix_micros(F.col(left_ts)) + upper_us
    return (
        l_binned.join(r_binned, [on, "_bin"])
        .filter(F.unix_micros(F.col(right_ts)).between(lo, hi))
        .drop("_bin")
    )


# --- resampling / gap fill ----------------------------------------------------

_STEP_UNIT_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _step_seconds(step: str) -> int:
    """Parse an interval string like '1 hour' / '30 minutes' into whole
    seconds — the same value drives both the bucket truncation and the
    grid stride, which is what keeps them aligned."""
    parts = step.strip().split()
    if len(parts) != 2 or parts[1].lower() not in _STEP_UNIT_S:
        raise ValueError(f"unsupported resample step {step!r}")
    return int(parts[0]) * _STEP_UNIT_S[parts[1].lower()]


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular series onto a fixed grid with forward
    fill: per key, one grid point per ``step`` from the first to the
    last observation's bucket, carrying the latest observed value
    forward across empty buckets.

    Shape: per-key min/max (one aggregation) → grid rows built with
    ``sequence`` + explode (array-side, no shuffle beyond the agg) →
    left join of the per-bucket LAST observation (row_number over the
    bucket, deterministic via the (ts, order_cols) tie-break) → one
    key-ordered window for the fill (``last(value, ignorenulls)``).
    Grid size is bounded by (time range / step) per key, and every
    stage is key-partitioned — nothing global, so a 100 TB event table
    resamples at shuffle cost, not at grid-cross-join cost.

    The bucket truncation is derived from ``step`` (epoch-aligned
    ``floor(unix/step_s)*step_s``), so observation buckets and grid
    points share one alignment at any step — sub-hour and multi-hour
    grids included (a previous version hard-coded hourly truncation,
    which misaligned every non-hourly grid)."""
    from pyspark.sql import Window as W

    step_s = _step_seconds(step)
    hour = F.timestamp_seconds(
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(1_000_000 * step_s))
        * F.lit(step_s)
    )
    bounds = events.groupBy(key_col).agg(
        F.min(hour).alias("mn"), F.max(hour).alias("mx")
    )
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("mn", "mx", F.expr(f"interval {step}"))).alias("bucket"),
    )

    obs = (
        events.withColumn("rn", F.row_number().over(
            W.partitionBy(key_col, hour).orderBy(F.desc(ts_col), *[F.desc(c) for c in order_cols])
        ))
        .filter(F.col("rn") == 1)
        .select(key_col, hour.alias("bucket"), F.col(value_col).alias("obs_value"))
    )

    wfill = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(obs, [key_col, "bucket"], "left_outer")
        .select(
            key_col,
            F.unix_millis("bucket").alias("bucket_ms"),
            F.last("obs_value", ignorenulls=True).over(wfill).alias("value_ffill"),
        )
    )


def resample_interp(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_id",),
    step: str = "1 hour",
) -> DataFrame:
    """Regularize an irregular series onto a fixed grid with LINEAR
    interpolation: where ``resample_ffill`` carries the last observation
    flat across a gap, this draws the line between the surrounding
    anchors — the resampling mode numeric telemetry wants (a flat fill
    biases every gap toward its left edge).

    Same scale shape as ``resample_ffill`` (shared grid + last-per-
    bucket observation stages): per-key bounded grid, every stage
    key-partitioned.  The interpolation itself is two key-ordered
    windows — previous anchor (value, bucket) via ``last(...,
    ignorenulls)`` over the preceding frame and next anchor via
    ``first(..., ignorenulls)`` over the following frame — then one
    row-local expression v_prev + (v_next − v_prev) · Δt_left / Δt_span
    on epoch-ms integers.  Grid edges are always anchored because the
    grid spans exactly [first, last] observed bucket per key, so no
    extrapolation branch exists.  Output: (key, bucket_ms,
    value_interp, interpolated flag).  value_interp ships RAW (no
    engine-side round): midpoint interpolations of 2-decimal amounts
    land exactly on round-tie boundaries where Spark's BigDecimal
    HALF_UP and a float-multiply round() disagree — identical IEEE op
    order on identical inputs is bit-stable, an engine round() is
    not."""
    from pyspark.sql import Window as W

    step_s = _step_seconds(step)
    hour = F.timestamp_seconds(
        F.floor(F.unix_micros(F.col(ts_col)) / F.lit(1_000_000 * step_s))
        * F.lit(step_s)
    )
    bounds = events.groupBy(key_col).agg(
        F.min(hour).alias("mn"), F.max(hour).alias("mx")
    )
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("mn", "mx", F.expr(f"interval {step}"))).alias("bucket"),
    )
    obs = (
        events.withColumn("rn", F.row_number().over(
            W.partitionBy(key_col, hour).orderBy(F.desc(ts_col), *[F.desc(c) for c in order_cols])
        ))
        .filter(F.col("rn") == 1)
        .select(key_col, hour.alias("bucket"), F.col(value_col).alias("obs_value"))
    )
    joined = grid.join(obs, [key_col, "bucket"], "left_outer").select(
        key_col, F.unix_millis("bucket").alias("bucket_ms"), "obs_value"
    )
    wprev = W.partitionBy(key_col).orderBy("bucket_ms").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wnext = W.partitionBy(key_col).orderBy("bucket_ms").rowsBetween(
        W.currentRow, W.unboundedFollowing
    )
    anchored = joined.select(
        key_col,
        "bucket_ms",
        "obs_value",
        F.last("obs_value", ignorenulls=True).over(wprev).alias("pv"),
        F.last(
            F.when(F.col("obs_value").isNotNull(), F.col("bucket_ms")),
            ignorenulls=True,
        ).over(wprev).alias("pb"),
        F.first("obs_value", ignorenulls=True).over(wnext).alias("nv"),
        F.first(
            F.when(F.col("obs_value").isNotNull(), F.col("bucket_ms")),
            ignorenulls=True,
        ).over(wnext).alias("nb"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("bucket_ms") - F.col("pb")).cast("double")
        / (F.col("nb") - F.col("pb")).cast("double")
    )
    return anchored.select(
        key_col,
        "bucket_ms",
        F.when(F.col("obs_value").isNotNull(), F.col("obs_value"))
        .otherwise(interp)
        .alias("value_interp"),
        F.col("obs_value").isNull().alias("interpolated"),
    )


def _assert_no_ord_ties(pairs: DataFrame, ord_col: str, op: str) -> DataFrame:
    """Fail loudly if a key's collected ``_series`` has duplicate order
    values — the sequential folds below would otherwise silently consume
    duplicate buckets in (o, v)-sorted order.  ``assert_true`` returns
    NULL when the condition holds, so the ``when(...isNull(), _series)``
    wrapper forces the check to evaluate without changing the column
    (Catalyst would prune a free-standing dropped assert column)."""
    ok = F.assert_true(
        F.size(F.array_distinct(F.transform(F.col("_series"), lambda x: x["o"])))
        == F.size("_series"),
        F.lit(
            f"{op}: duplicate {ord_col} values within a key — pre-aggregate "
            "to one row per (key, bucket) before smoothing"
        ),
    )
    return pairs.withColumn("_series", F.when(ok.isNull(), F.col("_series")))


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ord_col: str,
    val_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponential moving average over the ordered series:
    e_1 = x_1; e_t = α·x_t + (1−α)·e_{t−1} — one row out per row in,
    with ``out_col`` appended.

    The fold is SEQUENTIAL, which Spark cannot window — so each key's
    series is collected into a sorted array and folded ARRAY-SIDE with
    one ``aggregate`` expression (JVM codegen, no Python, no UDF).
    Per-key state is the series length: the right tool when the order
    axis has a BOUNDED domain (daily/monthly buckets over a fixed date
    range — the registered query's shape), regardless of how many rows
    aggregate into each bucket.  For an unbounded per-key series this
    shape is wrong by construction — chunk the axis or move to the
    streaming detector's applyInPandasWithState instead.

    Ties on ``ord_col`` within a key would make the fold
    order-ambiguous; callers pass pre-aggregated (key, bucket) rows —
    enforced here with a defensive distinct-width check (an array-side
    ``assert_true`` per key, O(series) like the fold itself) that fails
    the job with a clear message instead of silently folding duplicate
    buckets in (o, v)-sorted order."""
    o_t = df.schema[ord_col].dataType.simpleString()
    v_t = df.schema[val_col].dataType.simpleString()
    acc_t = f"array<struct<o:{o_t}, v:{v_t}, e:double>>"
    pairs = df.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ord_col).alias("o"), F.col(val_col).alias("v")))
        ).alias("_series")
    )
    pairs = _assert_no_ord_ties(pairs, ord_col, "ewma")
    a = float(alpha)
    folded = F.expr(
        f"""aggregate(
  _series,
  cast(array() as {acc_t}),
  (acc, x) -> concat(acc, array(named_struct(
    'o', x.o,
    'v', x.v,
    'e', CASE WHEN size(acc) = 0 THEN cast(x.v as double)
              ELSE {a!r} * x.v + {1.0 - a!r} * element_at(acc, -1).e END))))"""
    )
    return (
        pairs.select(*key_cols, F.explode(folded).alias("_f"))
        .select(
            *key_cols,
            F.col("_f.o").alias(ord_col),
            F.col("_f.v").alias(val_col),
            F.col("_f.e").alias(out_col),
        )
    )


def holt_linear(
    df: DataFrame,
    key_cols: list[str],
    ord_col: str,
    val_col: str,
    alpha: float,
    beta: float,
) -> DataFrame:
    """Per-key Holt linear (double-exponential) smoothing:

        l_1 = x_1, b_1 = 0
        l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    Returns one row per input row with ``level``, ``trend``, and
    ``forecast`` = l_t + b_t (the one-step-ahead prediction — compare to
    the NEXT bucket's value to get forecast error).  Same bounded-domain
    array-fold shape as ``ewma``; see its docstring for when this shape
    is (and is not) appropriate."""
    o_t = df.schema[ord_col].dataType.simpleString()
    v_t = df.schema[val_col].dataType.simpleString()
    acc_t = f"array<struct<o:{o_t}, v:{v_t}, l:double, b:double>>"
    pairs = df.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ord_col).alias("o"), F.col(val_col).alias("v")))
        ).alias("_series")
    )
    pairs = _assert_no_ord_ties(pairs, ord_col, "holt_linear")
    a, b = float(alpha), float(beta)
    folded = F.expr(
        f"""aggregate(
  _series,
  cast(array() as {acc_t}),
  (acc, x) -> concat(acc, array(CASE WHEN size(acc) = 0
    THEN named_struct('o', x.o, 'v', x.v,
                      'l', cast(x.v as double), 'b', cast(0.0 as double))
    ELSE named_struct('o', x.o, 'v', x.v,
      'l', {a!r} * x.v
           + {1.0 - a!r} * (element_at(acc, -1).l + element_at(acc, -1).b),
      'b', {b!r} * (({a!r} * x.v
                     + {1.0 - a!r} * (element_at(acc, -1).l + element_at(acc, -1).b))
                    - element_at(acc, -1).l)
           + {1.0 - b!r} * element_at(acc, -1).b)
    END)))"""
    )
    return (
        pairs.select(*key_cols, F.explode(folded).alias("_f"))
        .select(
            *key_cols,
            F.col("_f.o").alias(ord_col),
            F.col("_f.v").alias(val_col),
            F.col("_f.l").alias("level"),
            F.col("_f.b").alias("trend"),
            (F.col("_f.l") + F.col("_f.b")).alias("forecast"),
        )
    )


def holt_winters_additive(
    df: DataFrame,
    key_cols: list[str],
    ord_col: str,
    val_col: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
) -> DataFrame:
    """Per-key additive Holt-Winters (triple-exponential) smoothing with
    season length ``period`` (m >= 2):

        t <= m:  l_t = x_t,  b_t = 0,  s_t = 0          (warm-up)
        t >  m:  l_t = α·(x_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
                 b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
                 s_t = γ·(x_t − l_t) + (1−γ)·s_{t−m}

    Returns one row per input row with ``level``, ``trend``,
    ``seasonal`` and ``forecast`` = l_t + b_t + s_{t+1−m} (the
    one-step-ahead prediction; the seasonal term is a LAG over the
    already-folded frame, so it never needs a third inlining of l_t).
    The deliberately simple warm-up (level tracks the raw series,
    seasonal 0) keeps the recurrence exactly replayable as a recursive
    CTE carrying the seasonal history as a list — the EWMA/Holt oracle
    technique extended with one array column.  Same bounded-domain
    array-fold shape as ``ewma``; see its docstring for when this shape
    applies.  s_{t−m} is ``element_at(acc, −m)`` — the accumulator
    holds entries 1..t−1, so −m indexes exactly t−m."""
    if int(period) < 2:
        raise ValueError("holt_winters_additive requires period >= 2")
    m = int(period)
    o_t = df.schema[ord_col].dataType.simpleString()
    v_t = df.schema[val_col].dataType.simpleString()
    acc_t = f"array<struct<o:{o_t}, v:{v_t}, l:double, b:double, s:double>>"
    pairs = df.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ord_col).alias("o"), F.col(val_col).alias("v"))
            )
        ).alias("_series")
    )
    pairs = _assert_no_ord_ties(pairs, ord_col, "holt_winters_additive")
    a, b, g = float(alpha), float(beta), float(gamma)
    # l_t inlined into b_t and s_t (the lambda has no let-binding) —
    # the oracle spells the identical inlining, so the doubles match
    l_new = (
        f"{a!r} * (x.v - element_at(acc, -{m}).s)"
        f" + {1.0 - a!r} * (element_at(acc, -1).l + element_at(acc, -1).b)"
    )
    folded = F.expr(
        f"""aggregate(
  _series,
  cast(array() as {acc_t}),
  (acc, x) -> concat(acc, array(CASE WHEN size(acc) < {m}
    THEN named_struct('o', x.o, 'v', x.v,
                      'l', cast(x.v as double),
                      'b', cast(0.0 as double), 's', cast(0.0 as double))
    ELSE named_struct('o', x.o, 'v', x.v,
      'l', {l_new},
      'b', {b!r} * (({l_new}) - element_at(acc, -1).l)
           + {1.0 - b!r} * element_at(acc, -1).b,
      's', {g!r} * (x.v - ({l_new}))
           + {1.0 - g!r} * element_at(acc, -{m}).s)
    END)))"""
    )
    out = pairs.select(*key_cols, F.explode(folded).alias("_f")).select(
        *key_cols,
        F.col("_f.o").alias(ord_col),
        F.col("_f.v").alias(val_col),
        F.col("_f.l").alias("level"),
        F.col("_f.b").alias("trend"),
        F.col("_f.s").alias("seasonal"),
    )
    w = Window.partitionBy(*key_cols).orderBy(ord_col)
    return out.withColumn(
        "forecast",
        F.col("level")
        + F.col("trend")
        + F.coalesce(F.lag("seasonal", m - 1).over(w), F.lit(0.0)),
    )
