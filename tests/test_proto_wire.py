"""proto3 wire-format codec: golden vectors + round-trip properties +
Spark UDF integration (S6 — the reference's wire format, proto/*.proto).

Golden byte vectors are hand-computed canonical protoc encodings, so they
pin the layout independently of the implementation under test.
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from depositaja_spark.streaming.proto_wire import (
    COUNTER,
    DEPOSIT,
    DEPOSIT_HISTORY,
    FLAG_EVENT,
    FLAG_VALUE,
    decode_message,
    decode_varint,
    encode_message,
    encode_varint,
)

# --- varint primitives --------------------------------------------------------


@pytest.mark.parametrize(
    "value,raw",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),
        (16384, b"\x80\x80\x01"),
        # int64 -1 → uint64 2^64-1 → ten bytes, canonical protobuf
        (-1, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"),
        ((1 << 63) - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\x7f"),
    ],
)
def test_varint_golden(value, raw):
    assert encode_varint(value) == raw
    u, pos = decode_varint(raw, 0)
    assert pos == len(raw)
    assert u == value & ((1 << 64) - 1)


def test_varint_truncated():
    with pytest.raises(ValueError):
        decode_varint(b"\x80", 0)


# --- golden message vectors ----------------------------------------------------


def test_deposit_golden():
    # Deposit{wallet_id:"w1", amount:2.5}
    # field1: tag 0x0A (1<<3|2), len 2, "w1"
    # field2: tag 0x11 (2<<3|1), 2.5 LE fixed64
    raw = b"\x0a\x02w1\x11" + struct.pack("<d", 2.5)
    assert encode_message(DEPOSIT, {"wallet_id": "w1", "amount": 2.5}) == raw
    assert decode_message(DEPOSIT, raw) == {"wallet_id": "w1", "amount": 2.5}


def test_deposit_zero_values_omitted():
    # proto3 implicit presence: zero values serialize to nothing
    assert encode_message(DEPOSIT, {"wallet_id": "", "amount": 0.0}) == b""
    # and decode restores them
    assert decode_message(DEPOSIT, b"") == {"wallet_id": "", "amount": 0.0}


def test_flag_event_golden():
    # FlagEvent{flag_removed:true, rolling_period_start_unix:300}
    raw = b"\x08\x01\x10\xac\x02"
    v = {"flag_removed": True, "rolling_period_start_unix": 300}
    assert encode_message(FLAG_EVENT, v) == raw
    assert decode_message(FLAG_EVENT, raw) == v


def test_counter_golden():
    # Counter{rolling_period_start_unix:1, received:1.0}
    raw = b"\x08\x01\x11" + struct.pack("<d", 1.0)
    v = {"rolling_period_start_unix": 1, "received": 1.0}
    assert encode_message(COUNTER, v) == raw
    assert decode_message(COUNTER, raw) == v


def test_deposit_history_golden():
    # DepositHistory{wallet_id:"w", deposits:[Deposit{wallet_id:"w", amount:1.0}]}
    inner = b"\x0a\x01w\x11" + struct.pack("<d", 1.0)  # 12 bytes
    raw = b"\x0a\x01w" + b"\x12" + bytes([len(inner)]) + inner
    v = {"wallet_id": "w", "deposits": [{"wallet_id": "w", "amount": 1.0}]}
    assert encode_message(DEPOSIT_HISTORY, v) == raw
    assert decode_message(DEPOSIT_HISTORY, raw) == v


def test_decode_any_field_order_and_unknown_fields():
    # decoder must accept non-canonical order and skip unknown fields
    f2 = b"\x11" + struct.pack("<d", 2.5)
    f1 = b"\x0a\x02w1"
    unknown_varint = b"\x18\x2a"  # field 3, wire type 0, value 42
    unknown_ld = b"\x22\x03abc"  # field 4, wire type 2, len 3
    raw = f2 + unknown_varint + f1 + unknown_ld
    assert decode_message(DEPOSIT, raw) == {"wallet_id": "w1", "amount": 2.5}


def test_decode_truncated_raises():
    with pytest.raises(ValueError):
        decode_message(DEPOSIT, b"\x0a\x05ab")  # declared len 5, 2 present
    with pytest.raises(ValueError):
        decode_message(DEPOSIT, b"\x11\x00\x00")  # fixed64 cut short


def test_negative_zero_and_nan_are_kept():
    # -0.0 and NaN are NOT the proto3 default 0.0 → must serialize
    enc = encode_message(DEPOSIT, {"wallet_id": "", "amount": -0.0})
    assert enc != b""
    assert math.copysign(1, decode_message(DEPOSIT, enc)["amount"]) == -1.0
    enc = encode_message(COUNTER, {"rolling_period_start_unix": 0, "received": float("nan")})
    assert math.isnan(decode_message(COUNTER, enc)["received"])


# --- round-trip properties ------------------------------------------------------

_finite_doubles = st.floats(allow_nan=False, allow_infinity=True, width=64)
_int64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@settings(max_examples=200, deadline=None)
@given(wallet=st.text(max_size=40), amount=_finite_doubles)
def test_deposit_roundtrip(wallet, amount):
    v = {"wallet_id": wallet, "amount": amount}
    assert decode_message(DEPOSIT, encode_message(DEPOSIT, v)) == v


@settings(max_examples=200, deadline=None)
@given(start=_int64, received=_finite_doubles)
def test_counter_roundtrip(start, received):
    v = {"rolling_period_start_unix": start, "received": received}
    assert decode_message(COUNTER, encode_message(COUNTER, v)) == v


@settings(max_examples=100, deadline=None)
@given(flagged=st.booleans(), start=_int64)
def test_flag_value_roundtrip(flagged, start):
    v = {"flagged": flagged, "rolling_period_start_unix": start}
    assert decode_message(FLAG_VALUE, encode_message(FLAG_VALUE, v)) == v


@settings(max_examples=100, deadline=None)
@given(
    wallet=st.text(max_size=20),
    deposits=st.lists(
        st.fixed_dictionaries(
            {"wallet_id": st.text(max_size=20), "amount": _finite_doubles}
        ),
        max_size=8,
    ),
)
def test_history_roundtrip(wallet, deposits):
    v = {"wallet_id": wallet, "deposits": deposits}
    assert decode_message(DEPOSIT_HISTORY, encode_message(DEPOSIT_HISTORY, v)) == v


# --- Spark UDF integration -------------------------------------------------------


def test_spark_pb_roundtrip(spark):
    """encode_protobuf / decode_protobuf as columns: struct → bytes →
    struct is identity over a real frame, including nested repeated."""
    from pyspark.sql import functions as F

    from depositaja_spark.streaming.codecs import decode_protobuf, encode_protobuf

    rows = [("w1", 2.5), ("w2", -3.25), ("w1", 0.0), ("", 7.0)]
    df = spark.createDataFrame(rows, "wallet_id string, amount double")
    enc = encode_protobuf(DEPOSIT)
    dec = decode_protobuf(DEPOSIT)
    out = (
        df.select(enc(F.struct("wallet_id", "amount")).alias("pb"))
        .select(dec(F.col("pb")).alias("d"))
        .select("d.wallet_id", "d.amount")
    )
    assert sorted(map(tuple, out.collect())) == sorted(rows)

    # nested: DepositHistory with a repeated message field
    hist = df.groupBy("wallet_id").agg(
        F.sort_array(F.collect_list(F.struct("wallet_id", "amount"))).alias("deposits")
    )
    henc = encode_protobuf(DEPOSIT_HISTORY)
    hdec = decode_protobuf(DEPOSIT_HISTORY)
    back = (
        hist.select(henc(F.struct("wallet_id", "deposits")).alias("pb"))
        .select(hdec(F.col("pb")).alias("h"))
        .select("h.wallet_id", F.explode("h.deposits").alias("d"))
        .select("wallet_id", "d.amount")
    )
    assert sorted(map(tuple, back.collect())) == sorted((w, a) for w, a in rows)


def test_spark_pb_golden_bytes(spark):
    """The Spark-side encoder emits the exact protoc-canonical bytes."""
    from pyspark.sql import functions as F

    from depositaja_spark.streaming.codecs import encode_protobuf

    df = spark.createDataFrame([("w1", 2.5)], "wallet_id string, amount double")
    enc = encode_protobuf(DEPOSIT)
    (got,) = df.select(enc(F.struct("wallet_id", "amount")).alias("pb")).collect()
    assert bytes(got.pb) == b"\x0a\x02w1\x11" + struct.pack("<d", 2.5)
