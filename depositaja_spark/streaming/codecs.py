"""Message codecs: the schema-bound encode/decode layer.

The reference binds one protobuf codec per topic (DepositCodec
depositaja.go:14-23, DepositListCodec :25-34, CounterCodec
detector/detector.go:24-33, FlagEventCodec flagger/flagger.go:18-27,
FlagValueCodec :29-38).  The engine's equivalents:

* JSON codec (broker-free default, fully testable here): ``from_json`` /
  ``to_json`` against the explicit StructTypes in schemas.py — never
  schema inference.
* protobuf codec: ``pyspark.sql.protobuf.functions.from_protobuf`` /
  ``to_protobuf`` against a compiled descriptor set — requires the
  spark-protobuf jar on the classpath, so it is gated behind a runtime
  check and raises a clear error when unavailable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_json(value: Column, schema: T.StructType) -> Column:
    """Kafka ``value`` (binary/string JSON) → typed struct."""
    return F.from_json(value.cast("string"), schema)


def encode_json(*cols: Column) -> Column:
    """Typed columns → JSON string payload."""
    return F.to_json(F.struct(*cols))


def decode_kafka_json(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Kafka source frame (key, value, ...) → typed columns, key preserved
    as wallet_id (the reference keys every message by wallet,
    service/service.go:99)."""
    return raw.select(
        F.col("key").cast("string").alias("kafka_key"),
        decode_json(F.col("value"), schema).alias("msg"),
    ).select("kafka_key", "msg.*")


def encode_kafka_json(df: DataFrame, key_col: str, payload_cols: list[str]) -> DataFrame:
    """Typed frame → Kafka sink frame (key, value) with the wallet key set
    so the broker hash-partitions per wallet exactly like the reference."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        encode_json(*[F.col(c) for c in payload_cols]).alias("value"),
    )


def from_protobuf_gated(value: Column, message_name: str, descriptor_path: str) -> Column:
    """Protobuf decode — needs the spark-protobuf artifact (not bundled in
    this environment).  Kept as the production codec path; the JSON codec
    above is the drop-in test-path replacement with identical schemas."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        # the Python wrapper exists even without the jar — constructing the
        # column is what surfaces the missing artifact
        return from_protobuf(value, message_name, descFilePath=descriptor_path)
    except Exception as e:  # pragma: no cover
        raise NotImplementedError(
            "protobuf codec requires the org.apache.spark:spark-protobuf "
            "artifact on the classpath; use the JSON codec in tests"
        ) from e


def to_protobuf_gated(data: Column, message_name: str, descriptor_path: str) -> Column:
    try:
        from pyspark.sql.protobuf.functions import to_protobuf

        return to_protobuf(data, message_name, descFilePath=descriptor_path)
    except Exception as e:  # pragma: no cover
        raise NotImplementedError(
            "protobuf codec requires the org.apache.spark:spark-protobuf "
            "artifact on the classpath; use the JSON codec in tests"
        ) from e
