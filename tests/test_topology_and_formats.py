"""T1-T4 topology orchestration + file-format source/sink tests."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from depositaja_spark.operators import balance_per_wallet, valid_deposits
from depositaja_spark.sources import deposits_from_events, load_table
from depositaja_spark.sources.formats import read_csv, read_json, read_orc, write_partitioned
from depositaja_spark.streaming.topology import Topology

SF = "/root/testdata/sf0.001"


def test_topology_runs_all_processors(spark, tmp_path):
    """T3: concurrent processor groups on one session; the /check read
    path answers from the serving state they maintain."""
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "events.parquet")

    topo = Topology(spark, str(events_dir), str(tmp_path / "work"))
    topo.start()
    topo.await_all()
    topo.stop()

    batch = balance_per_wallet(
        valid_deposits(deposits_from_events(load_table(spark, SF, "events")))
    )
    some = batch.limit(3).collect()
    for r in some:
        got = topo.check(r.wallet_id)
        assert round(got["balance"], 4) == round(r.balance, 4)
    assert topo.check("ghost") == {
        "wallet_id": "ghost",
        "balance": 0.0,
        "above_threshold": False,
    }


def test_topology_exact_semantics_variant(spark, tmp_path):
    """T3 with the faithful stateful detector wired in place of the
    windowed one (the -detector flag analog with exact semantics)."""
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", events_dir / "events.parquet")

    topo = Topology(
        spark, str(events_dir), str(tmp_path / "work"), exact_semantics=True
    )
    topo.start()
    topo.await_all()
    topo.stop()
    flags = topo.serving.read("flags")
    assert flags is not None
    # nothing in sf0.001 crosses 10k within the rolling window
    assert flags.filter(F.col("flagged")).count() == 0


def test_format_roundtrips(spark, tmp_path):
    """CSV/JSON/ORC read-write roundtrips preserve the deposit frame."""
    deposits = (
        valid_deposits(deposits_from_events(load_table(spark, SF, "events")))
        .select("wallet_id", "amount", "seq")
        .orderBy("seq")
        .limit(100)
    )
    want = [(r.wallet_id, r.amount, r.seq) for r in deposits.collect()]
    schema = deposits.schema

    csv_p = str(tmp_path / "d_csv")
    deposits.write.option("header", "true").csv(csv_p)
    got = {(r.wallet_id, r.amount, r.seq) for r in read_csv(spark, csv_p, schema).collect()}
    assert got == set(want)

    json_p = str(tmp_path / "d_json")
    deposits.write.json(json_p)
    got = {(r.wallet_id, r.amount, r.seq) for r in read_json(spark, json_p, schema).collect()}
    assert got == set(want)

    orc_p = str(tmp_path / "d_orc")
    deposits.write.orc(orc_p)
    got = {(r.wallet_id, r.amount, r.seq) for r in read_orc(spark, orc_p).collect()}
    assert got == set(want)


def test_partitioned_write_enables_pruning(spark, tmp_path):
    """Partition-by layout: a filter on the partition column must prune
    at the file-listing level (PartitionFilters, not data filters)."""
    events = load_table(spark, SF, "events")
    out = str(tmp_path / "by_type")
    write_partitioned(events, out, partition_by=["event_type"], target_files=4)
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert back.count() == events.filter(F.col("event_type") == "purchase").count()


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction: 16 tiny files → 2, identical row multiset."""
    import os

    from depositaja_spark.sources.formats import compact

    p = str(tmp_path / "frag")
    df = spark.range(0, 1000).selectExpr("id", "id % 7 AS k")
    df.repartition(16).write.parquet(p)
    before = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert before >= 8

    n = compact(spark, p, 2)
    assert n == 2
    got = sorted(r.id for r in spark.read.parquet(p).collect())
    assert got == list(range(1000))
