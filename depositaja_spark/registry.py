"""Query registry: every implemented operator as a named batch query with a
matching DuckDB oracle (SURVEY.md §5 test strategy).

Each entry couples
  * a Spark callable ``(spark, sf_dir) -> DataFrame`` built from the
    operator library, and
  * an equivalent SQL string DuckDB runs over the same parquet tables,
so the driver (and ``tests/test_oracle.py``) can diff them: row count +
schema + order-insensitive value hash.

Conventions for hash-stable comparison:
  * every computed column is aliased identically on both sides;
  * double aggregates are ``round(x, 4)`` on both sides — source amounts
    are 2-decimal, so rounding at 4 places erases float summation-order
    noise without ever sitting on a rounding boundary;
  * event-time keys are epoch integers (``window_start_unix``, ``ts_ms``),
    never raw timestamps, so engine timezone/precision conventions can't
    skew the hash;
  * nested arrays are flattened to relational form (wallet_id, pos, ...)
    for the oracle-checked variant of A1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from depositaja_spark.operators import (
    balance_per_wallet,
    check_all,
    check_one,
    deposit_history,
    flag_events,
    latest_flag,
    latest_flag_from_windows,
    merge_manual_flags,
    negate_withdrawals,
    point_lookup,
    valid_deposits,
    window_received,
)
from depositaja_spark.operators.admin import manual_flag_events
from depositaja_spark.operators.detector import above_threshold_windows
from depositaja_spark.plans import check_pipeline
from depositaja_spark.sources import deposits_from_events, load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: queries declared without an oracle (genuinely non-SQL-expressible; the
#: driver records a weaker rows-only check for these)
NO_ORACLE_OK: set[str] = set()


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        # a silent overwrite here would drop an earlier query from
        # coverage invisibly (the driver counts names) — fail at import
        assert name not in QUERIES, f"duplicate query registration: {name}"
        assert name not in ORACLES, f"duplicate oracle registration: {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _deposits(spark: SparkSession, sf_dir: str) -> DataFrame:
    return deposits_from_events(load_table(spark, sf_dir, "events"))


#: the events→deposits mapping as a reusable SQL CTE (FIXTURES.md mapping)
DEPOSITS_CTE = """
WITH deposits AS (
  SELECT CAST(user_id AS VARCHAR) AS wallet_id,
         value AS amount,
         ts,
         event_id AS seq
  FROM events
  WHERE event_type = 'purchase'
)
"""

#: deterministic 2-minute tumbling window anchor, identical in both engines:
#: Spark `floor(cast(ts as long) / 120) * 120`, DuckDB the expression below.
_WIN_SQL = "CAST(floor(epoch(ts)) AS BIGINT) // 120 * 120"

# --- P1/P2/P3: validate / project / negate ----------------------------------


@query(
    "valid_deposits",
    DEPOSITS_CTE
    + """
SELECT wallet_id, amount, epoch_ms(ts) AS ts_ms, seq
FROM deposits WHERE amount > 0
""",
)
def q_valid_deposits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — validation filter (reference service/service.go:87-91)."""
    d = valid_deposits(_deposits(spark, sf_dir))
    return d.select("wallet_id", "amount", F.unix_millis("ts").alias("ts_ms"), "seq")


@query(
    "rejected_deposits",
    DEPOSITS_CTE
    + """
SELECT wallet_id, amount, seq FROM deposits WHERE NOT (amount > 0)
""",
)
def q_rejected_deposits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 side-output — rows the reference rejects with HTTP 422."""
    from depositaja_spark.operators.validate import rejected_deposits

    return rejected_deposits(_deposits(spark, sf_dir)).select("wallet_id", "amount", "seq")


@query(
    "project_deposit",
    DEPOSITS_CTE + "SELECT wallet_id, amount FROM deposits",
)
def q_project_deposit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — projection onto the pb.Deposit shape (service/service.go:93-96)."""
    from depositaja_spark.operators.validate import project_deposit

    return project_deposit(_deposits(spark, sf_dir))


@query(
    "negate_withdrawals",
    DEPOSITS_CTE + "SELECT wallet_id, -amount AS amount, seq FROM deposits",
)
def q_negate_withdrawals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — the withdraw-stream sign flip (service/service.go:98-103)."""
    d = negate_withdrawals(_deposits(spark, sf_dir), is_deposit_stream=False)
    return d.select("wallet_id", "amount", "seq")


@query(
    "net_balance",
    """
WITH deposits AS (
  SELECT CAST(user_id AS VARCHAR) AS wallet_id, value AS amount
  FROM events WHERE event_type = 'purchase' AND value > 0
),
withdrawals AS (
  SELECT CAST(user_id AS VARCHAR) AS wallet_id, -value AS amount
  FROM events WHERE event_type = 'error' AND value > 0
),
moves AS (
  SELECT * FROM deposits UNION ALL SELECT * FROM withdrawals
)
SELECT wallet_id, round(sum(amount), 4) AS net_balance
FROM moves GROUP BY wallet_id
""",
)
def q_net_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 exercised end-to-end: the reference's withdraw scaffold is the
    SAME emitter handed a non-deposit stream constant, which negates the
    amount before emit (service/service.go:98-103; dead code in practice
    since cmd/service/main.go:16 always passes DepositStream).  Here a
    second event type plays the withdraw stream: both streams pass the
    same P1 validation (amount > 0 pre-negation, service/service.go:87-91),
    the withdraw side flows through negate_withdrawals, and one A2 fold
    nets them per wallet."""
    from depositaja_spark.operators.validate import project_deposit

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.col("user_id").cast("string").alias("wallet_id"),
        F.col("value").alias("amount"),
        "event_type",
    ).filter(F.col("amount") > 0)
    deposits = project_deposit(base.filter(F.col("event_type") == "purchase"))
    withdrawals = negate_withdrawals(
        base.filter(F.col("event_type") == "error"), is_deposit_stream=False
    ).select("wallet_id", "amount")
    return (
        deposits.unionByName(withdrawals)
        .groupBy("wallet_id")
        .agg(F.round(F.sum("amount"), 4).alias("net_balance"))
    )


# --- A1: collector ------------------------------------------------------------


@query(
    "deposit_history_flat",
    DEPOSITS_CTE
    + """
SELECT wallet_id,
       CAST(row_number() OVER (PARTITION BY wallet_id ORDER BY seq) - 1 AS INT) AS pos,
       amount
FROM deposits WHERE amount > 0
""",
)
def q_deposit_history_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — collector history (collector/collector.go:17-29), flattened to
    (wallet_id, pos, amount) so the oracle hash is representation-independent.
    The nested-array form is exercised by tests/test_wallet_operators.py."""
    hist = deposit_history(valid_deposits(_deposits(spark, sf_dir)), ordered=True)
    return hist.select(
        "wallet_id", F.posexplode("deposits").alias("pos", "dep")
    ).select("wallet_id", "pos", F.col("dep.amount").alias("amount"))


@query(
    "deposit_history_sizes",
    DEPOSITS_CTE
    + """
SELECT wallet_id, CAST(count(*) AS INT) AS n_deposits
FROM deposits WHERE amount > 0 GROUP BY wallet_id
""",
)
def q_deposit_history_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 property — per-wallet history length equals accepted-event count."""
    hist = deposit_history(valid_deposits(_deposits(spark, sf_dir)), ordered=False)
    return hist.select("wallet_id", F.size("deposits").alias("n_deposits"))


# --- A2: balance ---------------------------------------------------------------


@query(
    "balance_per_wallet",
    DEPOSITS_CTE
    + """
SELECT wallet_id, round(sum(amount), 4) AS balance
FROM deposits WHERE amount > 0 GROUP BY wallet_id
""",
)
def q_balance_per_wallet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — the serve-time balance fold (service/service.go:137-140) as a
    keyed sum."""
    return balance_per_wallet(valid_deposits(_deposits(spark, sf_dir)), round_to=4)


# --- A3 + P4 + P5: detector ----------------------------------------------------


@query(
    "window_received",
    DEPOSITS_CTE
    + f"""
SELECT wallet_id, {_WIN_SQL} AS window_start_unix, round(sum(amount), 4) AS received
FROM deposits WHERE amount > 0 GROUP BY 1, 2
""",
)
def q_window_received(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (deterministic variant) — per-wallet 2-minute tumbling-window sums
    (detector/detector.go:47-64, event-time analog)."""
    return window_received(valid_deposits(_deposits(spark, sf_dir)), round_to=4)


@query(
    "above_threshold_windows",
    DEPOSITS_CTE
    + f"""
SELECT * FROM (
  SELECT wallet_id, {_WIN_SQL} AS window_start_unix, round(sum(amount), 4) AS received
  FROM deposits WHERE amount > 0 GROUP BY 1, 2
) WHERE received >= 10000 AND window_start_unix IS NOT NULL
""",
)
def q_above_threshold_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — the detectSpammer predicate at the reference's constants
    (detector/detector.go:15-18,42-45)."""
    w = window_received(valid_deposits(_deposits(spark, sf_dir)), round_to=4)
    return above_threshold_windows(w)


@query(
    "hot_windows",
    DEPOSITS_CTE
    + """
SELECT * FROM (
  SELECT wallet_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 * 86400 AS window_start_unix,
         round(sum(amount), 4) AS received
  FROM deposits WHERE amount > 0 GROUP BY 1, 2
) WHERE received >= 250 AND window_start_unix IS NOT NULL
""",
)
def q_hot_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 at non-degenerate parameters (1-day window, threshold 250) so the
    threshold path is exercised on data that never crosses 10,000 in 2 min."""
    w = window_received(valid_deposits(_deposits(spark, sf_dir)), period_seconds=86400, round_to=4)
    return above_threshold_windows(w, max_amount=250.0)


@query(
    "flag_events",
    DEPOSITS_CTE
    + f"""
SELECT wallet_id,
       received < 10000 AS flag_removed,
       CASE WHEN received >= 10000 THEN window_start_unix ELSE CAST(0 AS BIGINT) END
         AS rolling_period_start_unix,
       window_start_unix AS seq
FROM (
  SELECT wallet_id, {_WIN_SQL} AS window_start_unix, round(sum(amount), 4) AS received
  FROM deposits WHERE amount > 0 GROUP BY 1, 2
)
""",
)
def q_flag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — conditional flag/unflag event construction
    (detector/detector.go:67-71)."""
    w = window_received(valid_deposits(_deposits(spark, sf_dir)), round_to=4)
    return flag_events(w)


# --- A4: flagger ----------------------------------------------------------------

_FLAG_EVENTS_SQL = f"""
flag_ev AS (
  SELECT wallet_id,
         received < 10000 AS flag_removed,
         CASE WHEN received >= 10000 THEN window_start_unix ELSE CAST(0 AS BIGINT) END
           AS rolling_period_start_unix,
         window_start_unix AS seq
  FROM (
    SELECT wallet_id, {_WIN_SQL} AS window_start_unix, round(sum(amount), 4) AS received
    FROM deposits WHERE amount > 0 GROUP BY 1, 2
  )
)
"""

_LATEST_FLAG_SQL = """
SELECT wallet_id,
       NOT arg_max(flag_removed, seq) AS flagged,
       CASE WHEN arg_max(flag_removed, seq) THEN CAST(0 AS BIGINT)
            ELSE arg_max(rolling_period_start_unix, seq) END AS rolling_period_start_unix
FROM flag_ev GROUP BY wallet_id
"""


@query("latest_flag", DEPOSITS_CTE + ", " + _FLAG_EVENTS_SQL + _LATEST_FLAG_SQL)
def q_latest_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — latest-value fold over flag events (flagger/flagger.go:40-57).

    Runs the fused packed-long fold (flagger.latest_flag_from_windows):
    value-identical to ``latest_flag(flag_events(w))`` for detector-derived
    events, but a HashAggregate instead of the max_by(struct)
    SortAggregate pair (r13 optimization; equivalence pinned by
    tests/test_wallet_operators.py and this query's unchanged oracle)."""
    w = window_received(valid_deposits(_deposits(spark, sf_dir)), round_to=4)
    return latest_flag_from_windows(w)


@query(
    "manual_override",
    DEPOSITS_CTE
    + ", "
    + _FLAG_EVENTS_SQL
    + """
, manual AS (
  SELECT * FROM (VALUES
    ('3', false, CAST(0 AS BIGINT), CAST(9223372036854775000 AS BIGINT)),
    ('7', true,  CAST(0 AS BIGINT), CAST(9223372036854775001 AS BIGINT))
  ) AS t(wallet_id, flag_removed, rolling_period_start_unix, seq)
),
all_ev AS (
  SELECT wallet_id, flag_removed, rolling_period_start_unix, seq FROM flag_ev
  UNION ALL SELECT * FROM manual
)
SELECT wallet_id,
       NOT arg_max(flag_removed, seq) AS flagged,
       CASE WHEN arg_max(flag_removed, seq) THEN CAST(0 AS BIGINT)
            ELSE arg_max(rolling_period_start_unix, seq) END AS rolling_period_start_unix
FROM all_ev GROUP BY wallet_id
""",
)
def q_manual_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — manual flag/unflag merged through the same A4 fold
    (cmd/flag-wallet/main.go:14-36): wallet '3' force-flagged, wallet '7'
    force-unflagged, with seq above any auto event so the manual row wins."""
    w = window_received(valid_deposits(_deposits(spark, sf_dir)), round_to=4)
    auto = flag_events(w)
    manual = manual_flag_events(
        spark, [("3", False, 9223372036854775000), ("7", True, 9223372036854775001)]
    )
    return latest_flag(merge_manual_flags(auto, manual))


# --- J1 + S7: check / lookup ------------------------------------------------------

_CHECK_ALL_SQL = (
    DEPOSITS_CTE
    + ", "
    + _FLAG_EVENTS_SQL
    + """
, bal AS (
  SELECT wallet_id, round(sum(amount), 4) AS balance
  FROM deposits WHERE amount > 0 GROUP BY wallet_id
),
flags AS (
"""
    + _LATEST_FLAG_SQL
    + """
)
SELECT b.wallet_id,
       coalesce(b.balance, 0.0) AS balance,
       coalesce(f.flagged, false) AS above_threshold
FROM bal b LEFT JOIN flags f USING (wallet_id)
"""
)


_CHECK_MANY_SQL = (
    _CHECK_ALL_SQL.replace(
        "SELECT b.wallet_id,",
        """SELECT p.wallet_id,""",
    ).replace(
        "FROM bal b LEFT JOIN flags f USING (wallet_id)",
        """FROM (VALUES ('3'), ('7'), ('42'), ('wallet-that-never-deposited')) p(wallet_id)
LEFT JOIN bal b USING (wallet_id)
LEFT JOIN flags f USING (wallet_id)""",
    )
)


@query("check_many", _CHECK_MANY_SQL)
def q_check_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 scale path — /check for a probe SET in one job: the probe keys
    broadcast against both serving tables (semi-join filter, then
    broadcast outer join), unknown wallets answering {0, false}.  The
    shape that batch-serves 10^4 lookups against a 10^9-row table without
    shuffling the table."""
    from depositaja_spark.operators.check import check_many

    d = valid_deposits(_deposits(spark, sf_dir))
    balances = balance_per_wallet(d, round_to=4)
    flags = latest_flag_from_windows(window_received(d, round_to=4))
    probes = spark.createDataFrame(
        [("3",), ("7",), ("42",), ("wallet-that-never-deposited",)], "wallet_id string"
    )
    return check_many(balances, flags, probes)


@query("check_all", _CHECK_ALL_SQL)
def q_check_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — the flagship: GET /check for every wallet
    (service/service.go:115-153), computed end-to-end from raw deposits."""
    return check_pipeline(_deposits(spark, sf_dir), round_to=4)


@query(
    "check_one",
    _CHECK_ALL_SQL.replace(
        "FROM bal b LEFT JOIN flags f USING (wallet_id)",
        "FROM bal b LEFT JOIN flags f USING (wallet_id) WHERE b.wallet_id = '3'",
    ),
)
def q_check_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/S7 — single-wallet check for a wallet that exists."""
    d = valid_deposits(_deposits(spark, sf_dir))
    balances = balance_per_wallet(d, round_to=4)
    flags = latest_flag_from_windows(window_received(d, round_to=4))
    return check_one(balances, flags, "3")


@query(
    "check_one_unknown",
    "SELECT 'wallet-that-never-deposited' AS wallet_id, 0.0 AS balance, false AS above_threshold",
)
def q_check_one_unknown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 edge case — unknown wallets still answer {0, false}
    (service/service.go:119-133)."""
    d = valid_deposits(_deposits(spark, sf_dir))
    balances = balance_per_wallet(d, round_to=4)
    flags = latest_flag_from_windows(window_received(d, round_to=4))
    return check_one(balances, flags, "wallet-that-never-deposited")


@query(
    "point_lookup",
    DEPOSITS_CTE
    + """
SELECT wallet_id, round(sum(amount), 4) AS balance
FROM deposits WHERE amount > 0 GROUP BY wallet_id
HAVING wallet_id = '5'
""",
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — view.Get(key) analog: keyed filter on a materialized table
    (service/service.go:128)."""
    bal = balance_per_wallet(valid_deposits(_deposits(spark, sf_dir)), round_to=4)
    return point_lookup(bal, "5")


# --- S6: codec (JSON decode analog of the protobuf codecs) -------------------------


@query(
    "decode_props",
    """
SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def q_decode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — codec surface: schema-bound decode of a serialized payload
    column (the JSON analog of DepositCodec, depositaja.go:14-23; the
    protobuf path itself is sources/codecs.py)."""
    from depositaja_spark.schemas import EVENT_PROPS

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.from_json("props", EVENT_PROPS).getField("k").alias("k")
    )


@query(
    "pb_roundtrip_deposits",
    DEPOSITS_CTE + "SELECT wallet_id, amount FROM deposits",
)
def q_pb_roundtrip_deposits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — the protobuf wire format itself (DepositCodec, depositaja.go:14-23;
    proto/wallet.proto:14-17): every deposit is marshaled to canonical proto3
    bytes and unmarshaled back on executors (streaming/proto_wire.py).  The
    oracle is the plain projection — a hash match proves the codec round-trips
    real data bit-exactly (doubles through fixed64 are lossless)."""
    from depositaja_spark.streaming.codecs import decode_protobuf, encode_protobuf
    from depositaja_spark.streaming.proto_wire import DEPOSIT

    d = _deposits(spark, sf_dir)
    enc = encode_protobuf(DEPOSIT)
    dec = decode_protobuf(DEPOSIT)
    return (
        d.select(enc(F.struct("wallet_id", "amount")).alias("pb"))
        .select(dec(F.col("pb")).alias("d"))
        .select("d.wallet_id", "d.amount")
    )


@query(
    "pb_roundtrip_history",
    DEPOSITS_CTE
    + """
SELECT wallet_id,
       CAST(row_number() OVER (PARTITION BY wallet_id ORDER BY seq) - 1 AS INT) AS pos,
       amount
FROM deposits WHERE amount > 0
""",
)
def q_pb_roundtrip_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — nested/repeated wire format (DepositListCodec, depositaja.go:25-34;
    pb.DepositHistory, proto/wallet.proto:19-22): per-wallet histories are
    marshaled as repeated embedded messages and unmarshaled back; the oracle is
    the same flattening used by deposit_history_flat."""
    from depositaja_spark.operators import deposit_history, valid_deposits
    from depositaja_spark.streaming.codecs import decode_protobuf, encode_protobuf
    from depositaja_spark.streaming.proto_wire import DEPOSIT_HISTORY

    hist = deposit_history(valid_deposits(_deposits(spark, sf_dir)), ordered=True)
    enc = encode_protobuf(DEPOSIT_HISTORY)
    dec = decode_protobuf(DEPOSIT_HISTORY)
    return (
        hist.select(enc(F.struct("wallet_id", "deposits")).alias("pb"))
        .select(dec(F.col("pb")).alias("h"))
        .select("h.wallet_id", F.posexplode("h.deposits").alias("pos", "dep"))
        .select("wallet_id", "pos", F.col("dep.amount").alias("amount"))
    )


# --- extended query families --------------------------------------------------
# The queries_* modules are imported (and SAMPLE_PRIORITY applied) by the
# package __init__, NOT here: the parent package always initializes before
# any submodule, so putting the registration imports there means a user
# can import ANY query module directly without tripping the
# registry ⇄ query-module cycle (each query module's
# `from depositaja_spark.registry import query` then always finds a
# fully-initialized registry).

# --- driver-sample priority ---------------------------------------------------
# The round driver correctness-checks the FIRST 50 registry entries in
# insertion order.  SAMPLE_PRIORITY is the explicit, reviewed-in-code list
# of queries that most need a driver check this round: everything the
# recorded r1–r4 artifacts have never covered, plus every query whose
# implementation (or shared code on its hot path) changed this round.
# It is a static literal — the order is identical on a fresh checkout and
# an artifact-bearing tree, and changing it is a deliberate, diffable
# edit rather than an import-time side effect.  All entries stay
# registered regardless of position — local tests (tests/test_oracle.py)
# still check every oracle-backed query every session.

SAMPLE_PRIORITY: tuple[str, ...] = (
    # -- round-13 changed queries, re-verified by the external gate ------
    #    hard_negative_pairs_ivf2 / semdedup_cells2: both bucket dgemm
    #    kernels extracted to module level, the ivf2 one gaining the
    #    1024-row anchor blocking + vectorized stable-argsort top-k
    #    (r12 verdict #1; skew-adversarial tests in
    #    tests/test_bucket_kernels.py).  multimodal_features: the
    #    float-recovery n = HALF_UP(value*total) now raise_errors past
    #    its exactness bound (total >= 1e6 bytes) instead of silently
    #    hashing a wrong count (r12 ADVICE). -----------------------------
    "hard_negative_pairs_ivf2",
    "semdedup_cells2",
    "multimodal_features",
    # -- the ENTIRE r5-vintage cohort (r12 verdict #4): the 32 queries
    #    whose latest driver sample is round 5 — after this window runs,
    #    no registered query's latest sample predates round 6, and
    #    tests/test_registry_rotation.py pins the tightened bound. -------
    "embedding_norm_stats",
    "excess_supply_suppliers",
    "forecast_revenue_change",
    "funnel_conversion",
    "global_sales_opportunity",
    "important_part_value",
    "leakage_safe_split",
    "min_cost_supplier",
    "minhash_lsh_near_dups",
    "nation_market_share",
    "nation_pair_volume",
    "pack_documents",
    "pack_manifest",
    "perplexity_buckets",
    "profit_by_nation_year",
    "promo_revenue_share",
    "purchase_error_pairs",
    "quantile_sketch_values",
    "returned_item_revenue",
    "revenue_by_nation",
    "scd2_user_status",
    "source_cap_sample",
    "source_epoch_plan",
    "stratified_sample",
    "supplier_cnt_by_part_attrs",
    "token_budget_select",
    "token_length_outliers",
    "top_supplier_revenue",
    "tpch_q3_topk",
    "training_export",
    "waiting_suppliers",
    "zipf_law_fit",
    # -- the ENTIRE r6-vintage cohort (15 queries, latest sample r6):
    #    3 + 32 + 15 fills the 50-slot window exactly, so round 14's
    #    refill starts from the r7 pool (40 queries). --------------------
    "bm25_search",
    "clean_corpus_full",
    "cohort_retention",
    "doc_hashed_embeddings",
    "dsir_importance_weights",
    "dsir_top_docs",
    "event_transition_matrix",
    "heavy_hitter_events",
    "referential_integrity_report",
    "rejected_deposits",
    "rfm_segments",
    "self_repetition_spans",
    "text_ann_topk",
    "user_activity_streaks",
    "valid_deposits",
)


def _apply_sample_priority() -> None:
    """Reorder QUERIES/ORACLES in place (other modules hold references to
    these dicts, so mutate rather than rebind): SAMPLE_PRIORITY entries
    first (in list order), then everything else in registration order."""
    prio = {n: i for i, n in enumerate(SAMPLE_PRIORITY)}
    order = sorted(QUERIES, key=lambda n: prio.get(n, len(prio)))  # stable
    q_snapshot = {n: QUERIES[n] for n in order}
    o_snapshot = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q_snapshot)
    ORACLES.clear()
    ORACLES.update(o_snapshot)
