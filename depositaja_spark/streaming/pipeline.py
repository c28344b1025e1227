"""Streaming pipeline builders: source mapping + the deterministic
(watermarked event-time) detector variant.

The file source here is the broker-free stand-in for the Kafka source
(kafka.py) — everything downstream of the source is identical.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from depositaja_spark.schemas import MAX_AMOUNT, ROLLING_PERIOD_SECONDS


def _events_raw_schema(events_dir: str) -> tuple[T.StructType, bool]:
    """Probe ONE parquet footer in ``events_dir`` to pick the ``ts``
    representation, mirroring the batch loader's dual-format handling
    (sources/tables.py:40-46):

    - TIMESTAMP(NANOS) parquet → Spark (with
      ``spark.sql.legacy.parquet.nanosAsLong``) surfaces ``ts`` as raw long
      nanos → declare LongType and convert ns→µs explicitly.
    - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false) → Spark 4 surfaces
      TIMESTAMP_NTZ → declare TimestampNTZType and cast under the UTC
      session zone (bit-identical micros, same as-if-UTC reading DuckDB
      applies to naive parquet timestamps).

    File streams never infer schemas, so this one-time driver-side footer
    read (a few KB) replaces inference; at 100 TB the probe cost is
    unchanged — one footer, not a scan.  Returns ``(schema, ts_is_nanos)``.

    Reference: the Kafka deposit stream (service/service.go:98-103) has no
    file format at all; this file source is the broker-free stand-in.
    """
    files = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    if not files and os.path.isfile(events_dir):
        files = [events_dir]
    if not files:
        # Fail loudly rather than guess (ADVICE r4): a stream declared
        # with a defaulted schema would silently misread ts if the first
        # file to arrive used the other representation (long nanos read
        # as NTZ micros = timestamps 1000× off).  File-stream schemas are
        # fixed at declaration, so the directory must hold at least one
        # representative file before the stream starts.
        raise FileNotFoundError(
            f"no parquet file in {events_dir!r} to probe the ts format from; "
            "write at least one representative events file before declaring "
            "the stream (schemas cannot be re-probed once the query starts)"
        )
    import pyarrow.parquet as pq

    t = pq.ParquetFile(files[0]).schema_arrow.field("ts").type
    import pyarrow as pa

    ts_is_nanos = False
    if pa.types.is_timestamp(t) and t.unit != "ns":
        ts_type: T.DataType = (
            T.TimestampType() if t.tz is not None else T.TimestampNTZType()
        )
    else:
        # plain int64 or nanosecond timestamp: surfaces as long nanos
        ts_is_nanos = True
        ts_type = T.LongType()
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    return schema, ts_is_nanos


def _events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Raw events file-stream with ``ts`` normalized to TimestampType
    regardless of on-disk representation (see ``_events_raw_schema``)."""
    schema, ts_is_nanos = _events_raw_schema(events_dir)
    events = spark.readStream.schema(schema).parquet(events_dir)
    if ts_is_nanos:
        # integer `div`, not `/`: epoch-nanos exceed double's 53-bit
        # mantissa (same conversion as sources/tables.py)
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        ts = F.col("ts").cast(T.TimestampType())
    return events.withColumn("ts", ts)


def deposits_stream_from_dir(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming analog of sources/deposits.py: a parquet-file stream of
    events rows → validated deposit stream.  Explicit schema (file streams
    never infer), filter + projection push into the scan."""
    events = _events_stream(spark, events_dir)
    return (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").cast("string").alias("wallet_id"),
            F.col("value").alias("amount"),
            F.col("ts"),
            F.col("event_id").alias("seq"),
        )
        .filter(F.col("amount") > 0)
    )


def streaming_window_received(
    deposits: DataFrame,
    period_seconds: int = ROLLING_PERIOD_SECONDS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """A3 deterministic variant on a stream: watermarked event-time
    tumbling windows.  The watermark bounds state: windows older than the
    watermark are finalized and evicted — this is what makes the operator
    runnable forever at 100 TB/day, unlike the reference's unbounded
    per-wallet table."""
    return (
        deposits.withWatermark("ts", watermark)
        .groupBy(
            F.col("wallet_id"),
            F.window("ts", f"{period_seconds} seconds").alias("win"),
        )
        .agg(F.sum("amount").alias("received"))
        .select(
            "wallet_id",
            F.col("win.start").cast("long").alias("window_start_unix"),
            "received",
        )
    )


def events_stream_from_dir(
    spark: SparkSession, events_dir: str, event_type: str
) -> DataFrame:
    """One event_type's rows as a typed stream (ts format-normalized)."""
    events = _events_stream(spark, events_dir)
    return events.filter(F.col("event_type") == event_type).select(
        "user_id", "ts", "event_id", "value"
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    range_s: int = 600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: pairs with the same key whose event
    times are within ±``range_s`` seconds.  Both sides watermarked; the
    time-range condition lets Spark bound each side's join state to the
    watermark + range horizon and evict behind it — the property that
    makes a stream-stream join runnable forever.  Batch analog:
    functions/temporal.py:range_join_binned (equivalence tested)."""
    l = left.select(
        F.col(on),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(on).alias(f"_r_{on}"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col(on) == F.col(f"_r_{on}"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {range_s} SECONDS"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {range_s} SECONDS"))
    )
    return l.join(r, cond).select(
        F.col(on), "l_id", "r_id",
        (F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("l_ts"))).alias("gap_us"),
    )


def streaming_user_sessions(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "60 minutes"
) -> DataFrame:
    """Streaming session windows: the same F.session_window expression as
    the batch query (queries_olap.session_window_stats) under a watermark —
    sessions finalize when the watermark passes their close."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_unix"),
            "n_events",
        )
    )


def streaming_exact_dedup(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication of an at-least-once source.

    The reference's delivery contract is at-least-once (Goka default):
    a broker redelivery double-counts every downstream aggregate.  This
    operator drops redelivered rows by key BEFORE they reach any state —
    ``dropDuplicatesWithinWatermark`` keeps one fingerprint per key in
    the state store and evicts it once the watermark passes, so state is
    bounded by the redelivery horizon (duplicates arriving within the
    watermark of first delivery are caught; infinitely-late replays are a
    checkpoint-recovery concern, not a dedup-state concern).  Batch
    analog: ``dropDuplicates(keys)`` — equivalence is tested."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def streaming_flag_events(windowed: DataFrame, max_amount: float = MAX_AMOUNT) -> DataFrame:
    """P5 on the stream: flag/unflag event per finalized (wallet, window),
    seq = window anchor (monotone per wallet, so the serving fold's
    latest-wins matches arrival order)."""
    above = F.col("received") >= max_amount
    return windowed.select(
        "wallet_id",
        (~above).alias("flag_removed"),
        F.when(above, F.col("window_start_unix"))
        .otherwise(F.lit(0).cast("long"))
        .alias("rolling_period_start_unix"),
        F.col("window_start_unix").alias("seq"),
    )


def streaming_distinct_users(
    events: DataFrame,
    window: str = "1 hour",
    rsd: float = 0.02,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-window distinct-user cardinality on the stream via HLL++
    (``approx_count_distinct``) under a watermarked tumbling window —
    the streaming twin of the batch ``sketch_distinct_users`` tier.

    Why a sketch and not ``count(distinct)``: streaming state for an
    exact distinct grows with the number of distinct keys per window
    (unbounded at 100 TB/day); the HLL register array is fixed-size per
    (window, event_type) group and its merge is a register-wise max —
    order- and partitioning-invariant, so the streamed result is
    bit-identical to the batch sketch over the same rows (asserted in
    tests/test_streaming.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .select(
            F.col("win.start").cast("long").alias("window_start_unix"),
            "event_type",
            "approx_users",
        )
    )


def streaming_heavy_hitters(
    events: DataFrame,
    state_dir: str,
    col: str = "event_type",
    k: int = 16,
):
    """Misra-Gries heavy hitters on a stream: a foreachBatch loop that
    maintains ONE ≤k-counter summary across micro-batches — the
    frequency twin of the windowed HLL tier.

    Per batch: the batch is summarized distributedly (per-partition MG,
    ≤ k×partitions rows reach the driver), then folded into the
    persisted summary with the same weighted merge.  Because the MG
    merge is associative over arbitrary merge trees, the maintained
    summary is bit-identical to the sequential batch loop over the same
    splits, and the superset guarantee (any item with cumulative
    frequency > n/(k+1) is present) holds over the whole stream
    history.  State is k counters — bytes, not keys — forever.

    Exactly-once under foreachBatch's at-least-once contract: state
    lives in ``state_dir/commit_<batch_id>`` directories.  A replayed
    micro-batch (batch_id ≤ the newest commit) is SKIPPED, so a retry
    can never double-fold; the new summary is staged to a temp dir and
    atomically renamed into place, so a crash mid-write leaves the
    previous commit intact (a leftover ``staged_*`` dir is ignored and
    overwritten on the replay).  Read the summary via
    ``load_mg_state``, never by globbing the dir.

    Returns a DataStreamWriter; caller picks trigger + checkpoint."""
    import os as _os
    import shutil as _shutil

    from depositaja_spark.functions.heavyhitters import (
        mg_merge,
        misra_gries_summaries,
    )

    schema = f"{col} string, cnt long"

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        commits = _mg_commits(state_dir)
        if commits and batch_id <= commits[-1][0]:
            return  # at-least-once replay of an already-folded batch
        old = load_mg_state(spark, state_dir, col)
        # sorted fold: collect order is nondeterministic and the weighted
        # merge is order-sensitive at overflow — sorting makes the
        # maintained state a pure function of (old state, batch contents).
        # NULL is a legal counter key (summaries count it since the
        # dropna=False fix) — sort it first so mixed None/str sorts.
        nkey = lambda t: (t[0] is not None, t[0] or "")  # noqa: E731
        parts = sorted(
            ((r[col], r.cnt) for r in misra_gries_summaries(batch, col, k).collect()),
            key=nkey,
        )
        merged = mg_merge(old, parts, k)
        staged = _os.path.join(state_dir, f"staged_{batch_id}")
        spark.createDataFrame(
            [(v, c) for v, c in sorted(merged.items(), key=nkey)], schema
        ).coalesce(1).write.mode("overwrite").parquet(staged)
        _os.rename(staged, _os.path.join(state_dir, f"commit_{batch_id}"))
        # retire superseded commits only AFTER the new one exists
        for _, name in commits:
            _shutil.rmtree(_os.path.join(state_dir, name), ignore_errors=True)

    return events.writeStream.foreachBatch(_process)


def _mg_commits(state_dir: str) -> list[tuple[int, str]]:
    """(batch_id, dirname) of every committed MG summary, ascending."""
    import os as _os

    if not _os.path.isdir(state_dir):
        return []
    out = []
    for name in _os.listdir(state_dir):
        if name.startswith("commit_"):
            try:
                out.append((int(name.split("_", 1)[1]), name))
            except ValueError:
                pass
    return sorted(out)


def load_mg_state(spark, state_dir: str, col: str = "event_type") -> dict:
    """The newest committed Misra-Gries summary as {value: count}
    (empty before the first commit)."""
    import os as _os

    commits = _mg_commits(state_dir)
    if not commits:
        return {}
    path = _os.path.join(state_dir, commits[-1][1])
    return {
        r[col]: r.cnt
        for r in spark.read.schema(f"{col} string, cnt long").parquet(path).collect()
    }


# --- streaming PSI drift monitor ---------------------------------------------

from depositaja_spark.functions.drift import (  # noqa: E402
    PSI_BINS,
    PSI_SMOOTH,
    psi_bin_col,
    psi_smoothed,
)


def streaming_psi_drift(
    events: DataFrame,
    state_dir: str,
    type_col: str = "event_type",
    value_col: str = "value",
    bins: int = PSI_BINS,
):
    """Streaming Population Stability Index: the FIRST micro-batch fits
    per-type fixed-width bin ranges and becomes the frozen BASELINE
    distribution; every later batch folds its (type, bin) counts into
    the CURRENT distribution.  ``psi_from_state`` then scores each
    type's drift vs baseline at any time — the continuously-maintained
    twin of the batch ``psi_value_drift`` query, sharing its smoothing
    math.

    Per batch the heavy work is distributed (bin assignment against a
    broadcast ≤|types|-row range frame + one keyed count); only the
    |types|×bins cell summary reaches the driver.  State is the cell
    grid + the range frame — cap-bounded forever, like the MG tier.

    Types never seen in the baseline batch have no fitted ranges and
    are dropped from later batches' counts (a drift score needs a
    baseline to drift FROM); re-seed the state dir when the type
    universe changes.

    Replay-safe under foreachBatch's at-least-once contract with the
    same commit_<batch_id> staged-rename protocol as
    ``streaming_heavy_hitters``: an already-committed batch_id is
    skipped, so retries can never double-fold.

    Returns a DataStreamWriter; caller picks trigger + checkpoint."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    cell_schema = f"{type_col} string, period string, bin long, n long"
    range_schema = f"{type_col} string, mn double, mx double"

    def _bin_counts(batch: DataFrame, ranges: DataFrame, period: str):
        # NULL values must not reach the fold: psi_bin_col(NULL) is a
        # NULL bin, and a None bin key would crash the sorted() cell
        # canonicalization — the batch twin already excludes NULL bins
        # via its grid left-join, so filtering here keeps both paths
        # counting the identical population.
        batch = batch.filter(F.col(value_col).isNotNull())
        binned = batch.join(F.broadcast(ranges), type_col).select(
            type_col,
            psi_bin_col(
                F.col(value_col), F.col("mn"), F.col("mx"), bins
            ).alias("bin"),
        )
        return [
            (r[type_col], period, r["bin"], r["n"])
            for r in binned.groupBy(type_col, "bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        commits = _mg_commits(state_dir)
        if commits and batch_id <= commits[-1][0]:
            return  # at-least-once replay of an already-folded batch
        if commits:
            path = _os.path.join(state_dir, commits[-1][1])
            ranges = spark.read.schema(range_schema).parquet(
                _os.path.join(path, "ranges")
            )
            old_cells = [
                tuple(r)
                for r in spark.read.schema(cell_schema)
                .parquet(_os.path.join(path, "cells"))
                .collect()
            ]
            new_cells = _bin_counts(batch, ranges, "current")
            range_rows = [tuple(r) for r in ranges.collect()]
        else:
            # first batch: fit ranges and seed the baseline
            ranges = batch.groupBy(type_col).agg(
                F.min(value_col).cast("double").alias("mn"),
                F.max(value_col).cast("double").alias("mx"),
            )
            range_rows = [tuple(r) for r in ranges.collect()]
            ranges = spark.createDataFrame(range_rows, range_schema)
            old_cells = []
            new_cells = _bin_counts(batch, ranges, "baseline")
        folded: dict = {}
        for t, p, bn, n in old_cells + new_cells:
            key = (t, p, bn)
            folded[key] = folded.get(key, 0) + n
        staged = _os.path.join(state_dir, f"staged_{batch_id}")
        _shutil.rmtree(staged, ignore_errors=True)
        cells_rows = sorted((t, p, bn, n) for (t, p, bn), n in folded.items())
        spark.createDataFrame(cells_rows, cell_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_os.path.join(staged, "cells"))
        spark.createDataFrame(sorted(range_rows), range_schema).coalesce(
            1
        ).write.mode("overwrite").parquet(_os.path.join(staged, "ranges"))
        _os.rename(staged, _os.path.join(state_dir, f"commit_{batch_id}"))
        for _, name in commits:
            _shutil.rmtree(_os.path.join(state_dir, name), ignore_errors=True)

    return events.writeStream.foreachBatch(_process)


def load_psi_state(spark, state_dir: str, type_col: str = "event_type"):
    """The newest committed PSI cell grid as
    {(type, period, bin): count} (empty before the first commit)."""
    import os as _os

    commits = _mg_commits(state_dir)
    if not commits:
        return {}
    path = _os.path.join(state_dir, commits[-1][1])
    return {
        (r[type_col], r.period, r.bin): r.n
        for r in spark.read.schema(
            f"{type_col} string, period string, bin long, n long"
        ).parquet(_os.path.join(path, "cells")).collect()
    }


def psi_from_state(cells: dict, bins: int = PSI_BINS, a: float = PSI_SMOOTH):
    """PSI per type from the maintained cell grid, via the SHARED
    smoothed fold (``functions/drift.py:psi_smoothed`` — the same math
    the batch ``psi_value_drift`` query and oracle use): every bin cell
    gets +a, each period's total gets +a·bins, PSI = Σ (p_cur − p_base)
    · ln(p_cur / p_base).  Types with no 'current' mass yet score
    against an all-zero (uniform-after-smoothing) current
    distribution."""
    types = {t for (t, _p, _b) in cells}
    return {
        t: psi_smoothed(
            {b: cells.get((t, "current", b), 0) for b in range(bins)},
            {b: cells.get((t, "baseline", b), 0) for b in range(bins)},
            bins,
            a,
        )
        for t in sorted(types)
    }


#: CUSUM allowance: target = SLACK × μ — the same +5% no-alarm band the
#: batch ``cusum_value_shift`` query bakes into its oracle (literal 1.05
#: on both engines there; shared here so the monitor can't drift).
CUSUM_SLACK = 1.05


def streaming_cusum_shift(
    events: DataFrame,
    state_dir: str,
    type_col: str = "event_type",
    value_col: str = "value",
):
    """Streaming CUSUM level-shift monitor: the FIRST micro-batch's
    per-type mean becomes the frozen target μ; every later batch folds
    its own mean through Page's recursion S ← max(0, S + (x̄_b −
    CUSUM_SLACK·μ)).  The continuously-maintained twin of the batch
    ``cusum_value_shift`` query: same statistic and slack, sampled at
    micro-batch grain instead of the hourly calendar — in a stream the
    arrival order IS the sequence, so the textbook recursion (which the
    batch side must reshape into its prefix-min closed form) is the
    natural streaming form.

    Per batch the heavy work is ONE distributed keyed aggregation
    (exact DECIMAL sum + count per type, map-side combined); only the
    ≤|types|-row (sum, n) summary reaches the driver, and state is the
    per-type (μ, S, batches) triple — cap-bounded forever, like the MG
    and PSI tiers.  NULL values are excluded on both the fit and fold
    paths (the batch twin's WHERE value IS NOT NULL).

    Types unseen in the baseline batch have no target and are dropped
    from later folds (a shift needs a level to shift FROM); re-seed the
    state dir when the type universe changes.  Replay-safe under
    foreachBatch's at-least-once contract via the same
    commit_<batch_id> staged-rename protocol as the MG/PSI monitors.

    Returns a DataStreamWriter; caller picks trigger + checkpoint."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    state_schema = f"{type_col} string, mu double, s double, batches long"

    def _batch_means(batch: DataFrame) -> dict:
        rows = (
            batch.filter(F.col(value_col).isNotNull())
            .groupBy(type_col)
            .agg(
                F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sd"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        # float(Decimal)/int is the identical one-division arithmetic the
        # batch query's CAST(sum AS DOUBLE)/count performs
        return {r[type_col]: float(r["sd"]) / r["n"] for r in rows}

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        commits = _mg_commits(state_dir)
        if commits and batch_id <= commits[-1][0]:
            return  # at-least-once replay of an already-folded batch
        means = _batch_means(batch)
        if commits:
            path = _os.path.join(state_dir, commits[-1][1])
            state = {
                r[type_col]: (r.mu, r.s, r.batches)
                for r in spark.read.schema(state_schema)
                .parquet(_os.path.join(path, "state"))
                .collect()
            }
            for t, (mu, s, b) in state.items():
                if t in means:
                    state[t] = (
                        mu,
                        max(0.0, s + (means[t] - CUSUM_SLACK * mu)),
                        b + 1,
                    )
        else:
            # baseline batch: its mean IS the target; S starts at 0
            state = {t: (m, 0.0, 1) for t, m in means.items()}
        staged = _os.path.join(state_dir, f"staged_{batch_id}")
        _shutil.rmtree(staged, ignore_errors=True)
        rows = sorted((t, mu, s, b) for t, (mu, s, b) in state.items())
        spark.createDataFrame(rows, state_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_os.path.join(staged, "state"))
        _os.rename(staged, _os.path.join(state_dir, f"commit_{batch_id}"))
        for _, name in commits:
            _shutil.rmtree(_os.path.join(state_dir, name), ignore_errors=True)

    return events.writeStream.foreachBatch(_process)


def load_cusum_state(spark, state_dir: str, type_col: str = "event_type"):
    """The newest committed CUSUM state as {type: (mu, s, batches)}
    (empty before the first commit)."""
    import os as _os

    commits = _mg_commits(state_dir)
    if not commits:
        return {}
    path = _os.path.join(state_dir, commits[-1][1])
    return {
        r[type_col]: (r.mu, r.s, r.batches)
        for r in spark.read.schema(
            f"{type_col} string, mu double, s double, batches long"
        ).parquet(_os.path.join(path, "state")).collect()
    }


def streaming_auc_monitor(
    events: DataFrame,
    state_dir: str,
    type_col: str = "event_type",
    value_col: str = "value",
    pos: str = "purchase",
    neg: str = "click",
):
    """Streaming ROC-AUC monitor: maintains the exact two-arm value
    histogram across micro-batches and lets ``auc_from_state`` read the
    running Mann–Whitney AUC at any time — the continuously-maintained
    twin of the batch ``mannwhitney_value_dist`` query (live separation
    tracking for a score column: 'is the signal that separates
    purchases from clicks decaying?').

    Per batch the heavy work is ONE distributed keyed count per
    (value-cents, arm), map-side combined; only the distinct-value
    summary reaches the driver, and the state IS that histogram —
    DOMAIN-bounded (2-decimal money in a bounded range, ≤ ~10⁵ cells)
    no matter how many batches fold in, like the MG/PSI/CUSUM tiers.
    Values fold at exact cents (DECIMAL(18,2)·100 → BIGINT), so no
    float ever enters the state.  NULL values and other event types are
    excluded — the batch twin's WHERE clause.  Replay-safe under
    foreachBatch's at-least-once contract via the same
    commit_<batch_id> staged-rename protocol as the other monitors.

    Returns a DataStreamWriter; caller picks trigger + checkpoint."""
    import os as _os
    import shutil as _shutil

    from pyspark.sql import functions as F

    cell_schema = "cents long, c1 long, c2 long"

    def _batch_cells(batch: DataFrame) -> list:
        is_pos = F.col(type_col) == pos
        rows = (
            batch.filter(
                F.col(type_col).isin(pos, neg) & F.col(value_col).isNotNull()
            )
            .groupBy(
                (F.col(value_col).cast("decimal(18,2)") * 100)
                .cast("long")
                .alias("cents")
            )
            .agg(
                F.sum(F.when(is_pos, 1).otherwise(0)).cast("long").alias("c1"),
                F.sum(F.when(is_pos, 0).otherwise(1)).cast("long").alias("c2"),
            )
            .collect()
        )
        return [(r.cents, r.c1, r.c2) for r in rows]

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        commits = _mg_commits(state_dir)
        if commits and batch_id <= commits[-1][0]:
            return  # at-least-once replay of an already-folded batch
        folded: dict = {}
        if commits:
            path = _os.path.join(state_dir, commits[-1][1])
            for r in (
                spark.read.schema(cell_schema)
                .parquet(_os.path.join(path, "cells"))
                .collect()
            ):
                folded[r.cents] = (r.c1, r.c2)
        for cents, c1, c2 in _batch_cells(batch):
            o1, o2 = folded.get(cents, (0, 0))
            folded[cents] = (o1 + c1, o2 + c2)
        staged = _os.path.join(state_dir, f"staged_{batch_id}")
        _shutil.rmtree(staged, ignore_errors=True)
        rows = sorted((c, a, b) for c, (a, b) in folded.items())
        spark.createDataFrame(rows, cell_schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_os.path.join(staged, "cells"))
        _os.rename(staged, _os.path.join(state_dir, f"commit_{batch_id}"))
        for _, name in commits:
            _shutil.rmtree(_os.path.join(state_dir, name), ignore_errors=True)

    return events.writeStream.foreachBatch(_process)


def load_auc_state(spark, state_dir: str) -> dict:
    """The newest committed AUC histogram as {cents: (c1, c2)} (empty
    before the first commit)."""
    import os as _os

    commits = _mg_commits(state_dir)
    if not commits:
        return {}
    path = _os.path.join(state_dir, commits[-1][1])
    return {
        r.cents: (r.c1, r.c2)
        for r in spark.read.schema("cents long, c1 long, c2 long")
        .parquet(_os.path.join(path, "cells"))
        .collect()
    }


def auc_from_state(cells: dict) -> dict:
    """Mann–Whitney statistics from the maintained histogram, with the
    BATCH TWIN'S exact arithmetic (doubled midranks as integers, one
    float division per output) so the monitor and
    ``mannwhitney_value_dist`` agree bit-for-bit on identical data.
    Returns {} until both arms have mass; z is None when the tie-
    corrected variance is 0 (all values equal)."""
    import math

    n1 = sum(c1 for c1, _ in cells.values())
    n2 = sum(c2 for _, c2 in cells.values())
    if n1 == 0 or n2 == 0 or n1 + n2 <= 1:
        return {}
    r1x2 = 0
    tie3 = 0
    cb = 0
    for cents in sorted(cells):
        c1, c2 = cells[cents]
        t = c1 + c2
        r1x2 += c1 * (2 * cb + t + 1)
        tie3 += t * t * t - t
        cb += t
    u1 = float(r1x2 - n1 * (n1 + 1)) / 2
    n12 = float(n1) * float(n2)
    n = float(n1 + n2)
    var_u = n12 / 12 * ((n + 1) - float(tie3) / (n * (n - 1)))
    z = (u1 - n12 / 2) / math.sqrt(var_u) if var_u > 0 else None
    return {
        "n_pos": n1,
        "n_neg": n2,
        "u_stat": u1,
        "auc": u1 / n12,
        "z_stat": z,
    }


# --- streaming distinct-cardinality monitor (HyperLogLog) ---------------------

#: HLL precision: m = 2^p registers — the monitor's whole state is m
#: rows forever, whatever the stream's cardinality
HLL_P = 12
HLL_M = 1 << HLL_P

#: width of the rho-domain: hash64 yields 60 bits, p index the register
_HLL_WBITS = 60 - HLL_P


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: dict[int, int], m: int = HLL_M) -> float:
    """Flajolet HLL estimate from a sparse {register: max_rho} dict —
    absent registers are zeros.  Includes the standard small-range
    linear-counting correction (the regime driver fixtures live in)."""
    import math

    z = float(m - len(registers))  # zero registers contribute 2^0
    z += sum(2.0 ** (-rho) for rho in registers.values())
    e = _hll_alpha(m) * m * m / z
    v = m - len(registers)
    if e <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return e


def streaming_hll_users(
    events: DataFrame,
    state_dir: str,
    key_col: str = "user_id",
):
    """Streaming distinct-cardinality monitor: maintains ONE HyperLogLog
    register vector over ``key_col`` across micro-batches — the 'how
    many unique users have we ever seen' gauge that an exact distinct
    cannot provide unboundedly (its state would grow with the key
    universe; HLL state is {HLL_M} rows forever).
    
    Per batch the heavy work is one distributed keyed aggregation
    (register index → max rho, map-side combined, output ≤ m rows);
    only that bounded frame reaches the driver, where merge with the
    previous state is elementwise max — HLL's merge IS max, so
    replayed/overlapping batches are absorbed idempotently (on top of
    the same commit_<batch_id> staged-rename at-least-once protocol as
    the MG/PSI/CUSUM/AUC monitors).  Hashing is the repo's portable
    md5-derived hash64, so a pure-Python replay is bit-exact
    (tests/test_streaming_hll.py).

    Returns a DataStreamWriter; caller picks trigger + checkpoint."""
    import os as _os
    import shutil as _shutil

    from depositaja_spark.functions.text import hash64

    state_schema = "reg long, rho long"

    def _batch_regs(batch: DataFrame) -> dict[int, int]:
        h = hash64(F.col(key_col).cast("string"))
        w = F.shiftrightunsigned(h, HLL_P)
        # rho = leading zeros of w within the (60-p)-bit window + 1;
        # bit_length(w) via floor(log2) is float-fragile — use the exact
        # integer identity rho = wbits - bit_length(w) + 1 computed from
        # 64 - bit_count of the propagated-suffix mask
        filled = w
        for s in (1, 2, 4, 8, 16, 32):
            filled = filled.bitwiseOR(F.shiftrightunsigned(filled, s))
        bitlen = F.bit_count(filled)  # == bit_length(w), exact
        rho = F.lit(_HLL_WBITS) - bitlen + 1
        rows = (
            batch.filter(F.col(key_col).isNotNull())
            .select(
                (h.bitwiseAND(F.lit(HLL_M - 1))).alias("reg"),
                rho.cast("long").alias("rho"),
            )
            .groupBy("reg")
            .agg(F.max("rho").alias("rho"))
            .collect()
        )
        return {int(r.reg): int(r.rho) for r in rows}

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        commits = _mg_commits(state_dir)
        if commits and batch_id <= commits[-1][0]:
            return
        regs = _batch_regs(batch)
        if commits:
            path = _os.path.join(state_dir, commits[-1][1])
            prev = {
                int(r.reg): int(r.rho)
                for r in spark.read.schema(state_schema)
                .parquet(_os.path.join(path, "state"))
                .collect()
            }
            for k, v in prev.items():
                if regs.get(k, 0) < v:
                    regs[k] = v
        staged = _os.path.join(state_dir, f"staged_{batch_id}")
        _shutil.rmtree(staged, ignore_errors=True)
        rows = sorted(regs.items())
        spark.createDataFrame(rows or [(0, 0)], state_schema).coalesce(
            1
        ).write.mode("overwrite").parquet(_os.path.join(staged, "state"))
        _os.rename(staged, _os.path.join(state_dir, f"commit_{batch_id}"))
        for _, name in commits:
            _shutil.rmtree(_os.path.join(state_dir, name), ignore_errors=True)

    return events.writeStream.foreachBatch(_process)


def load_hll_state(spark, state_dir: str) -> dict[int, int]:
    """The newest committed HLL register vector as {reg: rho} (empty
    before the first commit; the (0, 0) empty-stream sentinel row is
    dropped)."""
    import os as _os

    commits = _mg_commits(state_dir)
    if not commits:
        return {}
    path = _os.path.join(state_dir, commits[-1][1])
    return {
        int(r.reg): int(r.rho)
        for r in spark.read.schema("reg long, rho long")
        .parquet(_os.path.join(path, "state"))
        .collect()
        if r.rho > 0
    }


# --- streaming quantile monitor (fixed-bin histogram) --------------------------

#: histogram grid: QTL_BINS bins of QTL_BIN_CENTS cents each, overflow
#: clamped into the top bin — the whole state is |types| × QTL_BINS rows
#: forever, whatever the stream length (the KLL sketch covers the batch
#: side; a fixed grid keeps the streaming merge = plain addition)
QTL_BINS = 512
QTL_BIN_CENTS = 50


def quantiles_from_state(
    cells: dict[tuple[str, int], int], qs: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> dict[str, dict[float, float]]:
    """Per-type quantile estimates (in value units) from the committed
    {(event_type, bin): count} histogram, linearly interpolated inside
    the hit bin — max error half a bin width for interior quantiles."""
    by_type: dict[str, dict[int, int]] = {}
    for (et, b), c in cells.items():
        by_type.setdefault(et, {})[b] = c
    out: dict[str, dict[float, float]] = {}
    for et, bins in by_type.items():
        n = sum(bins.values())
        if n == 0:
            continue
        est: dict[float, float] = {}
        for q in qs:
            target = q * n
            cum = 0.0
            for b in sorted(bins):
                c = bins[b]
                if cum + c >= target:
                    frac = (target - cum) / c
                    est[q] = (b + frac) * QTL_BIN_CENTS / 100.0
                    break
                cum += c
            else:
                top = max(bins)
                est[q] = (top + 1) * QTL_BIN_CENTS / 100.0
        out[et] = est
    return out


def streaming_value_quantiles(
    events: DataFrame,
    state_dir: str,
    type_col: str = "event_type",
    value_col: str = "value",
):
    """Streaming per-type quantile monitor: maintains one fixed-grid
    value histogram per event type across micro-batches — the p50/p90/
    p99 latency-style gauge whose exact computation needs a global sort
    the stream can never afford.  State is |types| × QTL_BINS counts
    forever (cap-bounded, like the MG/PSI/CUSUM monitors); merge is
    plain addition, so the at-least-once replay guard is the same
    commit_<batch_id> staged-rename protocol (an already-committed
    batch_id is skipped, never double-added).

    Per batch the heavy work is one distributed keyed (type, bin) count
    (map-side combined, ≤ |types|·QTL_BINS rows to the driver); cents
    come from the exact DECIMAL cast shared with the batch oracles, so
    a pure-Python replay is bit-exact (tests/test_streaming.py).

    Returns a DataStreamWriter; caller picks trigger + checkpoint."""
    state_schema = "event_type string, bin long, c long"

    def _batch_hist(batch: DataFrame) -> dict[tuple[str, int], int]:
        cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
        b = F.least(
            F.greatest(
                F.floor(cents / QTL_BIN_CENTS).cast("long"), F.lit(0)
            ),
            F.lit(QTL_BINS - 1),
        )
        rows = (
            batch.filter(
                F.col(value_col).isNotNull() & F.col(type_col).isNotNull()
            )
            .select(F.col(type_col).alias("event_type"), b.alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {(r.event_type, int(r.bin)): int(r.c) for r in rows}

    return _additive_grid_monitor(events, state_dir, state_schema, _batch_hist)


def _additive_grid_monitor(
    events: DataFrame,
    state_dir: str,
    state_schema: str,
    batch_counts,
):
    """Shared foreachBatch loop for the integer ADDITIVE-count grid
    monitors (quantile histogram, k-anonymity class grid): one
    (string, long) key → count state dict, merge = addition, persisted
    under the commit_<batch_id> staged-rename exactly-once protocol.
    ``batch_counts(batch) -> {(str, int): int}`` is the only per-monitor
    logic; the sentinel row (key ("", -1)) marks an empty state and is
    dropped on load.  ONE copy of the replay-guard / staged-write /
    rename / retire sequence serves every additive monitor."""
    import os as _os
    import shutil as _shutil

    def _load(spark) -> dict[tuple[str, int], int]:
        commits = _mg_commits(state_dir)
        if not commits:
            return {}
        path = _os.path.join(state_dir, commits[-1][1], "state")
        return {
            (r[0], int(r[1])): int(r[2])
            for r in spark.read.schema(state_schema).parquet(path).collect()
            if int(r[1]) >= 0
        }

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        commits = _mg_commits(state_dir)
        if commits and batch_id <= commits[-1][0]:
            return  # at-least-once replay of an already-folded batch
        state = _load(spark)
        for k, c in batch_counts(batch).items():
            state[k] = state.get(k, 0) + c
        staged = _os.path.join(state_dir, f"staged_{batch_id}")
        _shutil.rmtree(staged, ignore_errors=True)
        rows = sorted(state.items()) or [(("", -1), 0)]
        spark.createDataFrame(
            [(a, b, c) for (a, b), c in rows], state_schema
        ).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(staged, "state")
        )
        _os.rename(staged, _os.path.join(state_dir, f"commit_{batch_id}"))
        # retire superseded commits only AFTER the new one exists
        for _, name in commits:
            _shutil.rmtree(_os.path.join(state_dir, name), ignore_errors=True)

    return events.writeStream.foreachBatch(_process)


def load_quantile_state(spark, state_dir: str) -> dict[tuple[str, int], int]:
    """The newest committed histogram as {(event_type, bin): count}
    (empty before the first commit; the empty-stream sentinel row is
    dropped)."""
    import os as _os

    commits = _mg_commits(state_dir)
    if not commits:
        return {}
    path = _os.path.join(state_dir, commits[-1][1])
    return {
        (r.event_type, int(r.bin)): int(r.c)
        for r in spark.read.schema("event_type string, bin long, c long")
        .parquet(_os.path.join(path, "state"))
        .collect()
        if r.bin >= 0
    }


# --- streaming k-anonymity monitor ---------------------------------------------

KANON_K_MIN = 5


def streaming_k_anonymity(
    events: DataFrame,
    state_dir: str,
    type_col: str = "event_type",
):
    """k-anonymity guard on the stream: maintains exact per-class record
    counts under the (event_type, hour-of-day) quasi-identifier, so a
    release gate can ask at any moment which classes are re-identifiable
    (0 < count < k) before publishing a windowed aggregate.  The
    governance twin of the batch ``k_anonymity_audit``.

    State is the |types|×24 bounded class-count grid — integer counts
    whose merge is ADDITION: associative, commutative, and replayed
    batches are skipped by the commit protocol, so the maintained grid
    is bit-identical to one batch groupBy over the whole history
    (asserted in tests/test_streaming.py).  Same staged-rename
    commit_<batch_id> exactly-once discipline as the MG/PSI monitors:
    a crash mid-write leaves the previous commit intact; an
    at-least-once replay can never double-count.

    Returns a DataStreamWriter; caller picks trigger + checkpoint."""
    state_schema = f"{type_col} string, hour long, c long"

    def _batch_counts(batch: DataFrame) -> dict:
        rows = (
            batch.groupBy(
                F.col(type_col), F.hour("ts").cast("long").alias("hour")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {(r[type_col], int(r.hour)): int(r.c) for r in rows}

    return _additive_grid_monitor(events, state_dir, state_schema, _batch_counts)


def load_kanon_state(
    spark, state_dir: str, type_col: str = "event_type"
) -> dict[tuple[str, int], int]:
    """The newest committed class-count grid as {(type, hour): count}
    (empty before the first commit; the empty-stream sentinel dropped)."""
    import os as _os

    commits = _mg_commits(state_dir)
    if not commits:
        return {}
    path = _os.path.join(state_dir, commits[-1][1])
    return {
        (getattr(r, type_col), int(r.hour)): int(r.c)
        for r in spark.read.schema(f"{type_col} string, hour long, c long")
        .parquet(_os.path.join(path, "state"))
        .collect()
        if r.hour >= 0
    }


def kanon_report_from_state(
    state: dict[tuple[str, int], int], k_min: int = KANON_K_MIN
) -> dict:
    """Release-gate view of the maintained grid: the overall k (smallest
    non-empty class), the risky classes (0 < count < k_min), and the
    record share they hold."""
    counts = [c for c in state.values() if c > 0]
    risky = sorted(k for k, c in state.items() if 0 < c < k_min)
    total = sum(counts)
    return {
        "k": min(counts) if counts else 0,
        "n_classes": len(counts),
        "risky_classes": risky,
        "risky_records": sum(state[k] for k in risky),
        "total_records": total,
    }
