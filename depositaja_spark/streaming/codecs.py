"""Message codecs: the schema-bound encode/decode layer.

The reference binds one protobuf codec per topic (DepositCodec
depositaja.go:14-23, DepositListCodec :25-34, CounterCodec
detector/detector.go:24-33, FlagEventCodec flagger/flagger.go:18-27,
FlagValueCodec :29-38).  The engine's equivalents:

* JSON codec (broker-free default, fully testable here): ``from_json`` /
  ``to_json`` against the explicit StructTypes in schemas.py — never
  schema inference.
* protobuf codec, TWO tiers:
  - ``encode_protobuf`` / ``decode_protobuf`` — self-contained proto3
    wire-format codec (streaming/proto_wire.py) run as Arrow-batched
    Pandas UDFs.  No external artifact needed; byte-compatible with the
    protoc-generated Go marshaling the reference uses (golden-vector
    tested).  This is the RUNNING protobuf path in this environment.
  - ``from_protobuf_gated`` / ``to_protobuf_gated`` — the JVM-side
    ``spark-protobuf`` functions, preferred on a real cluster (codegen,
    no Python worker); gated because the jar is not bundled here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from depositaja_spark.streaming.proto_wire import (
    MessageSpec,
    decode_message,
    encode_message,
)


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


def pb_spark_schema(spec: MessageSpec) -> T.StructType:
    """proto3 message spec → Spark StructType (int64→long, double→double,
    string→string, bool→boolean, repeated message→array<struct>)."""
    fields = []
    for f in spec.fields:
        if f.kind == "string":
            dt: T.DataType = T.StringType()
        elif f.kind == "double":
            dt = T.DoubleType()
        elif f.kind == "int64":
            dt = T.LongType()
        elif f.kind == "bool":
            dt = T.BooleanType()
        else:
            dt = pb_spark_schema(f.message)
        if f.repeated:
            dt = T.ArrayType(dt, containsNull=False)
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)


def _plain(v):
    """Arrow/pandas cell → plain python for the wire encoder (numpy
    scalars → python scalars; ndarray of structs → list of dicts)."""
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if hasattr(v, "tolist") and not isinstance(v, (bytes, str)):  # numpy array/scalar
        return _plain(v.tolist())
    if hasattr(v, "item") and not isinstance(v, (bytes, str, int, float, bool)):
        return _plain(v.item())
    return v


def encode_protobuf(spec: MessageSpec):
    """Pandas UDF: struct column → proto3-encoded binary column.

    The production codec path for this environment (see module docstring);
    Arrow moves the struct batch, the per-row work is C-backed bytes ops
    in proto_wire.py."""

    @F.pandas_udf(T.BinaryType())
    def enc(s: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [encode_message(spec, _plain(rec)) for rec in s.to_dict("records")]
        )

    return enc


def decode_protobuf(spec: MessageSpec):
    """Pandas UDF: proto3 binary column → typed struct column (absent
    fields take proto3 zero values, exactly like generated Go code)."""
    schema = pb_spark_schema(spec)

    @F.pandas_udf(schema)
    def dec(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([decode_message(spec, bytes(b)) for b in s])

    return dec


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
