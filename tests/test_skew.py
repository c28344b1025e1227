"""Skew-salting utility: equivalence with plain aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from depositaja_spark.functions.skew import salted_sum
from depositaja_spark.operators import valid_deposits
from depositaja_spark.sources import deposits_from_events, load_table

SF = "/root/testdata/sf0.001"


def test_salted_sum_equals_plain_sum(spark):
    d = valid_deposits(deposits_from_events(load_table(spark, SF, "events")))
    plain = {
        r.wallet_id: round(r.b, 4)
        for r in d.groupBy("wallet_id").agg(F.sum("amount").alias("b")).collect()
    }
    salted = {
        r.wallet_id: round(r.balance, 4)
        for r in salted_sum(d, "wallet_id", "amount", "balance").collect()
    }
    assert salted == plain


def test_salted_sum_on_hot_key(spark):
    """A pathologically hot key (90% of rows) still sums correctly."""
    rows = [("hot", 1.0)] * 900 + [("cold", 2.0)] * 100
    df = spark.createDataFrame(rows, "wallet_id string, amount double")
    got = {r.wallet_id: r.balance for r in salted_sum(df, "wallet_id", "amount", "balance", buckets=8).collect()}
    assert got == {"hot": pytest.approx(900.0), "cold": pytest.approx(200.0)}
