"""Streaming pipeline builders: source mapping + the deterministic
(watermarked event-time) detector variant.

The file source here is the broker-free stand-in for the Kafka source
(kafka.py) — everything downstream of the source is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from depositaja_spark.schemas import MAX_AMOUNT, ROLLING_PERIOD_SECONDS

#: the driver's events.parquet stores ts as TIMESTAMP(NANOS); with
#: spark.sql.legacy.parquet.nanosAsLong the physical type is INT64, so the
#: stream schema declares long and converts explicitly (same ns→µs
#: truncation as sources/tables.py)
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def deposits_stream_from_dir(spark: SparkSession, events_dir: str) -> DataFrame:
    """Streaming analog of sources/deposits.py: a parquet-file stream of
    events rows → validated deposit stream.  Explicit schema (file streams
    never infer), filter + projection push into the scan."""
    events = spark.readStream.schema(EVENTS_RAW).parquet(events_dir)
    return (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").cast("string").alias("wallet_id"),
            F.col("value").alias("amount"),
            F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
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
