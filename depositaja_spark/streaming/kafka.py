"""Kafka source/sink wiring (S2/S3/S4/S5 in SURVEY.md §2.1).

No broker exists in this environment, so these builders are exercised for
plan construction only; the file-source pipeline (pipeline.py) is the
tested stand-in with identical downstream semantics.  Topic names mirror
the reference: ``deposit`` (depositaja.go:11) and ``flag_wallet``
(flagger/flagger.go:15).

The option dictionaries are built by PURE functions
(``source_options`` / ``sink_options``) so the exact option surface —
bootstrap servers, subscription, starting offsets, per-trigger rate cap,
checkpoint — is unit-testable against goldens without a broker, and a
real-broker round-trip test lights up via the SPARK_GRAFT_KAFKA_BROKERS
env var on any CI that has one (tests/test_kafka_options.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from depositaja_spark.schemas import DEPOSIT, FLAG_EVENT
from depositaja_spark.streaming.codecs import decode_kafka_json, encode_kafka_json

DEPOSIT_TOPIC = "deposit"
FLAG_TOPIC = "flag_wallet"


def source_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The exact option dict a Kafka readStream receives.

    ``starting_offsets``: "earliest" replays the topic like Goka
    rebuilding a view from the table topic; "latest" tails.  May also be
    a JSON offset map for exact resume.  ``max_offsets_per_trigger``
    bounds each micro-batch (backpressure on catch-up reads) — unset
    means read-all-available, the reference's behavior."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def sink_options(brokers: str, topic: str, checkpoint: str) -> dict[str, str]:
    """The exact option dict a Kafka writeStream receives.  The record
    key is NOT an option — it is the ``key`` column the encoder emits
    (keyed produce, preserving per-wallet partition ordering)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def _kafka_stream(spark: SparkSession, opts: dict[str, str]) -> DataFrame:
    return spark.readStream.format("kafka").options(**opts).load()


def kafka_deposit_source(
    spark: SparkSession,
    brokers: str,
    topic: str = DEPOSIT_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """deposit topic → typed deposit stream.

    The Kafka key is the wallet_id (reference service/service.go:99), so
    per-wallet ordering within a partition is preserved into the stateful
    operators downstream."""
    raw = _kafka_stream(
        spark,
        source_options(brokers, topic, starting_offsets, max_offsets_per_trigger),
    )
    return decode_kafka_json(raw, DEPOSIT).drop("kafka_key")


def kafka_flag_event_source(
    spark: SparkSession,
    brokers: str,
    topic: str = FLAG_TOPIC,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """flag_wallet topic → typed FlagEvent stream (consumed by the
    flagger fold, reference flagger/flagger.go:62)."""
    raw = _kafka_stream(
        spark,
        source_options(brokers, topic, starting_offsets, max_offsets_per_trigger),
    )
    return decode_kafka_json(raw, FLAG_EVENT).drop("kafka_key")


def kafka_sink(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str = "wallet_id",
    payload_cols: list[str] | None = None,
):
    """writeStream → Kafka with the wallet key set (keyed produce, the
    analog of EmitSync's keyed publish — but exactly-once via checkpoint
    instead of at-least-once)."""
    payload_cols = payload_cols or [c for c in df.columns if c != key_col]
    out = encode_kafka_json(df, key_col, payload_cols)
    return out.writeStream.format("kafka").options(
        **sink_options(brokers, topic, checkpoint)
    )
