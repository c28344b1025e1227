"""Explicit schemas for the reference's message types and the test tables.

The reference fixes its schemas ahead of time as proto3 messages
(reference proto/wallet.proto, proto/detector.proto, proto/flagger.proto);
there is no inference or dynamic typing.  We mirror that: every edge of the
engine carries an explicit StructType, so Kafka/JSON/parquet reads never
infer.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- reference message types (SURVEY.md §1.2) -------------------------------

#: pb.Deposit — stream event on topic "deposit" (proto/wallet.proto:14-17),
#: extended with event-time + arrival order which the deterministic engine
#: needs (the reference relies on Kafka offsets + processing time).
DEPOSIT = T.StructType(
    [
        T.StructField("wallet_id", T.StringType(), False),
        T.StructField("amount", T.DoubleType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)

#: pb.DepositHistory — value of the collector's balance table
#: (proto/wallet.proto:19-22): the full per-wallet deposit list.
DEPOSIT_HISTORY = T.StructType(
    [
        T.StructField("wallet_id", T.StringType(), False),
        T.StructField(
            "deposits",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("wallet_id", T.StringType(), False),
                        T.StructField("amount", T.DoubleType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

#: pb.Counter — value of the detector's threshold table (proto/detector.proto:14-17).
COUNTER = T.StructType(
    [
        T.StructField("wallet_id", T.StringType(), False),
        T.StructField("rolling_period_start_unix", T.LongType(), False),
        T.StructField("received", T.DoubleType(), False),
    ]
)

#: pb.FlagEvent — stream event on topic "flag_wallet" (proto/flagger.proto:15-18).
FLAG_EVENT = T.StructType(
    [
        T.StructField("wallet_id", T.StringType(), False),
        T.StructField("flag_removed", T.BooleanType(), False),
        T.StructField("rolling_period_start_unix", T.LongType(), False),
        T.StructField("seq", T.LongType(), True),
    ]
)

#: pb.FlagValue — value of the flagger table (proto/flagger.proto:20-23).
FLAG_VALUE = T.StructType(
    [
        T.StructField("wallet_id", T.StringType(), False),
        T.StructField("flagged", T.BooleanType(), False),
        T.StructField("rolling_period_start_unix", T.LongType(), False),
    ]
)

#: checkResponse — the read endpoint's output (reference service/service.go:24-28).
CHECK_RESPONSE = T.StructType(
    [
        T.StructField("wallet_id", T.StringType(), False),
        T.StructField("balance", T.DoubleType(), False),
        T.StructField("above_threshold", T.BooleanType(), False),
    ]
)

# --- detector constants (reference detector/detector.go:15-18) --------------

ROLLING_PERIOD_SECONDS = 120
MAX_AMOUNT = 10_000.0

# --- driver test tables (TESTDATA.md / FIXTURES.md §B) -----------------------

TEST_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: JSON payload schema of events.props (used by from_json — no inference).
EVENT_PROPS = T.StructType([T.StructField("k", T.LongType(), True)])
