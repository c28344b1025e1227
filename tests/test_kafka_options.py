"""Kafka option-surface tests (S2/S3): golden option dicts, key-column
encoding, and an env-gated true-broker round trip.

The sandbox has no broker and no spark-sql-kafka jar, so what CAN be
pinned locally is pinned exactly — the option dictionaries each builder
hands Spark, and the (key, value) frame the encoder produces — while the
full produce/consume round trip is a real test that SKIPS (not absent)
until SPARK_GRAFT_KAFKA_BROKERS points at a broker.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from depositaja_spark.streaming import kafka as K

BROKER_ENV = "SPARK_GRAFT_KAFKA_BROKERS"


def test_source_options_golden():
    assert K.source_options("b1:9092,b2:9092", "deposit") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "deposit",
        "startingOffsets": "earliest",
    }


def test_source_options_offsets_and_rate_cap():
    got = K.source_options(
        "b:9092", "deposit", starting_offsets="latest", max_offsets_per_trigger=5000
    )
    assert got == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "deposit",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "5000",
    }
    # exact-resume JSON offset maps pass through verbatim
    off = '{"deposit":{"0":42}}'
    assert K.source_options("b:9092", "deposit", off)["startingOffsets"] == off


def test_sink_options_golden(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    assert K.sink_options("b:9092", "flag_wallet", ckpt) == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "flag_wallet",
        "checkpointLocation": ckpt,
    }


def test_sink_frame_is_keyed_by_wallet(spark):
    """The produced frame must be (key, value) with key = wallet_id so
    the broker hash-partitions per wallet exactly like the reference's
    EmitSync(wallet_id, ...) (service/service.go:99)."""
    from depositaja_spark.streaming.codecs import encode_kafka_json

    df = spark.createDataFrame(
        [("w1", 5.0, 1), ("w2", -2.0, 2)], "wallet_id string, amount double, seq long"
    )
    out = encode_kafka_json(df, "wallet_id", ["wallet_id", "amount"])
    assert out.columns == ["key", "value"]
    rows = {r.key: r.value for r in out.collect()}
    assert set(rows) == {"w1", "w2"}
    assert '"amount":5.0' in rows["w1"]


def test_default_topics_match_reference():
    assert K.DEPOSIT_TOPIC == "deposit"  # depositaja.go:11
    assert K.FLAG_TOPIC == "flag_wallet"  # flagger/flagger.go:15


@pytest.mark.skipif(
    not os.environ.get(BROKER_ENV),
    reason=f"no Kafka broker: set {BROKER_ENV}=host:port to enable",
)
def test_broker_round_trip(spark, tmp_path):
    """True produce→consume round trip through a real broker: deposits
    written with kafka_sink come back typed and keyed through
    kafka_deposit_source.  Runs on any CI with a broker + the
    spark-sql-kafka package; everywhere else it reports SKIPPED."""
    brokers = os.environ[BROKER_ENV]
    topic = f"deposit_rt_{os.getpid()}"
    deposits = spark.createDataFrame(
        [("w1", 5.0, 1_700_000_000, 1), ("w2", 7.5, 1_700_000_001, 2)],
        "wallet_id string, amount double, ts long, seq long",
    )
    # batch produce via the same encoder the streaming sink uses
    from depositaja_spark.streaming.codecs import encode_kafka_json

    (
        encode_kafka_json(deposits, "wallet_id", ["wallet_id", "amount", "ts", "seq"])
        .write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .save()
    )
    stream = K.kafka_deposit_source(spark, brokers, topic)
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_rt")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.wallet_id, r.amount, r.seq)
        for r in spark.sql("SELECT * FROM kafka_rt").collect()
    }
    assert got == {("w1", 5.0, 1), ("w2", 7.5, 2)}


def test_sources_apply_golden_options(monkeypatch, spark):
    """The source builders must hand Spark EXACTLY source_options(...) —
    no drift between the unit-tested dict and the applied one."""
    seen: dict = {}

    class FakeLoaded:
        pass

    class FakeReader:
        def format(self, f):
            seen["format"] = f
            return self

        def options(self, **kw):
            seen["options"] = kw
            return self

        def load(self):
            raise RuntimeError("stop-before-jvm")

    monkeypatch.setattr(
        type(spark), "readStream", property(lambda self: FakeReader())
    )
    with pytest.raises(RuntimeError, match="stop-before-jvm"):
        K.kafka_deposit_source(
            spark, "b:9092", starting_offsets="latest", max_offsets_per_trigger=100
        )
    assert seen["format"] == "kafka"
    assert seen["options"] == K.source_options("b:9092", "deposit", "latest", 100)
