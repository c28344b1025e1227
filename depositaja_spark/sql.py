"""SQL API surface: the engine's tables and derived relations as views.

The DataFrame builders and ``spark.sql`` compile to the same Catalyst
plans; registering the engine's derived relations as temp views gives
users the full surface in plain SQL:

    register_all(spark, sf_dir)
    spark.sql("SELECT * FROM check_all WHERE above_threshold")

Views are lazy — no materialization happens at registration, and a query
touching one view pays only that view's plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from depositaja_spark.operators import (
    balance_per_wallet,
    flag_events,
    latest_flag_from_windows,
    valid_deposits,
    window_received,
)
from depositaja_spark.plans import check_pipeline
from depositaja_spark.sources import deposits_from_events, load_table, register_views


def register_all(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the base tables plus the engine's derived relations.

    Returns the list of registered view names."""
    register_views(spark, sf_dir)  # region..embeddings

    deposits = deposits_from_events(load_table(spark, sf_dir, "events"))
    accepted = valid_deposits(deposits)
    windowed = window_received(accepted, round_to=4)
    derived = {
        "deposits": deposits,
        "accepted_deposits": accepted,
        "balances": balance_per_wallet(accepted, round_to=4),
        "window_received_v": windowed,
        "flag_events_v": flag_events(windowed),
        "flags": latest_flag_from_windows(windowed),
        "check_all": check_pipeline(deposits, round_to=4),
    }
    for name, df in derived.items():
        df.createOrReplaceTempView(name)
    from depositaja_spark.schemas import TEST_TABLES

    return list(TEST_TABLES) + list(derived)
