"""Kafka source/sink wiring (S2/S3/S4/S5 in SURVEY.md §2.1).

No broker exists in this environment, so these builders are exercised for
plan construction only; the file-source pipeline (pipeline.py) is the
tested stand-in with identical downstream semantics.  Topic names mirror
the reference: ``deposit`` (depositaja.go:11) and ``flag_wallet``
(flagger/flagger.go:15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from depositaja_spark.schemas import DEPOSIT, FLAG_EVENT
from depositaja_spark.streaming.codecs import decode_kafka_json, encode_kafka_json

DEPOSIT_TOPIC = "deposit"
FLAG_TOPIC = "flag_wallet"


def kafka_deposit_source(
    spark: SparkSession, brokers: str, topic: str = DEPOSIT_TOPIC
) -> DataFrame:
    """deposit topic → typed deposit stream.

    The Kafka key is the wallet_id (reference service/service.go:99), so
    per-wallet ordering within a partition is preserved into the stateful
    operators downstream."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return decode_kafka_json(raw, DEPOSIT).drop("kafka_key")


def kafka_flag_event_source(
    spark: SparkSession, brokers: str, topic: str = FLAG_TOPIC
) -> DataFrame:
    """flag_wallet topic → typed FlagEvent stream (consumed by the
    flagger fold, reference flagger/flagger.go:62)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
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
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
