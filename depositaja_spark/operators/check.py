"""J1 + S7 — the read path: balance ⋈ flags with zero-value defaults
(SURVEY.md §2.4).

``GET /check/{wallet_id}`` looks up the balance table and the flag table
and combines them; a wallet missing from either table gets zero-value
defaults — including wallets that never deposited at all, which still
return ``{balance: 0, above_threshold: false}`` (service/service.go:115-153).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_all(balances: DataFrame, flags: DataFrame) -> DataFrame:
    """All-wallets check table: left-outer join balance←flags with
    coalesce defaults → (wallet_id, balance, above_threshold).

    The flags side is the output of a keyed aggregation (one row per
    flagged wallet — small relative to the event volume), so Catalyst/AQE
    picks a broadcast hash join at serving scale; both sides arrive already
    hash-partitioned on wallet_id from their upstream aggs, so even the
    sort-merge fallback reuses the exchange.
    """
    return (
        balances.join(flags, "wallet_id", "left_outer")
        .select(
            "wallet_id",
            F.coalesce(F.col("balance"), F.lit(0.0)).alias("balance"),
            F.coalesce(F.col("flagged"), F.lit(False)).alias("above_threshold"),
        )
    )


def check_one(balances: DataFrame, flags: DataFrame, wallet_id: str) -> DataFrame:
    """Single-wallet check — the literal ``/check/{wallet_id}`` semantics,
    INCLUDING the unknown-wallet case: always returns exactly one row, with
    zero-value defaults when the wallet appears in neither table
    (service/service.go:119-133).

    Implemented as a probe-key DataFrame left-joined against both serving
    tables; the probe side is one row, so both joins broadcast.
    """
    spark = balances.sparkSession
    probe = spark.createDataFrame([(wallet_id,)], "wallet_id string")
    return (
        probe.join(F.broadcast(balances.filter(F.col("wallet_id") == wallet_id)), "wallet_id", "left_outer")
        .join(F.broadcast(flags.filter(F.col("wallet_id") == wallet_id)), "wallet_id", "left_outer")
        .select(
            "wallet_id",
            F.coalesce(F.col("balance"), F.lit(0.0)).alias("balance"),
            F.coalesce(F.col("flagged"), F.lit(False)).alias("above_threshold"),
        )
    )


def check_many(balances: DataFrame, flags: DataFrame, probes: DataFrame) -> DataFrame:
    """Batch probe: ``/check`` for a SET of wallet ids — one row per probe,
    zero-value defaults for unknown wallets, same semantics as check_one
    row-by-row but one job.

    The probe set is broadcast (requests are small relative to the serving
    tables), so each serving table is scanned once with a broadcast hash
    join — the shape that serves a 10⁴-key batch lookup against a 10⁹-row
    serving table without shuffling the table.

    The hint rides ONLY the semi-join build sides (a supported
    build-right position); the outer assembly joins are left to AQE —
    hinting the probe frame there would put the broadcast on a
    left-outer's left child, a build Spark rejects (the hint is dropped
    with a HintErrorLogger warning and plans a shuffle anyway).
    """
    pk = probes.select("wallet_id").distinct()
    p = F.broadcast(pk)
    return (
        pk.join(balances.join(p, "wallet_id", "left_semi"), "wallet_id", "left_outer")
        .join(flags.join(p, "wallet_id", "left_semi"), "wallet_id", "left_outer")
        .select(
            "wallet_id",
            F.coalesce(F.col("balance"), F.lit(0.0)).alias("balance"),
            F.coalesce(F.col("flagged"), F.lit(False)).alias("above_threshold"),
        )
    )


def point_lookup(table: DataFrame, wallet_id: str) -> DataFrame:
    """S7 — ``view.Get(key)`` analog (service/service.go:128,142): a keyed
    filter against a materialized table.  On a parquet/Delta serving table
    the predicate prunes files/row-groups via min-max stats."""
    return table.filter(F.col("wallet_id") == wallet_id)
