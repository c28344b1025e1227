"""Validation / projection / scalar operators (SURVEY.md §2.2, P1-P3).

All three are single narrow transformations — no shuffle, fully inside
whole-stage codegen, and their predicates/projections push down to the
parquet (or Kafka-decode) scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def valid_deposits(deposits: DataFrame) -> DataFrame:
    """P1 — accept only ``amount > 0``.

    The reference rejects non-positive amounts with HTTP 422 before they
    ever reach Kafka (service/service.go:87-91); the engine's analog is a
    filter at the ingest edge.  Rows failing the predicate simply never
    enter downstream state — identical observable semantics.
    """
    return deposits.filter(F.col("amount") > 0)


def rejected_deposits(deposits: DataFrame) -> DataFrame:
    """P1 side-output — the rows the reference answers 422 for."""
    return deposits.filter(~(F.col("amount") > 0))


def project_deposit(deposits: DataFrame) -> DataFrame:
    """P2 — projection onto the pb.Deposit shape {wallet_id, amount}.

    Mirrors the request→message mapping at service/service.go:93-96.
    """
    return deposits.select("wallet_id", "amount")


def negate_withdrawals(deposits: DataFrame, is_deposit_stream: bool = True) -> DataFrame:
    """P3 — the withdraw scaffold: a non-deposit stream negates amounts.

    In the reference this is dead code in practice (service/service.go:98-103
    multiplies by -1 when the emitter's stream is not the deposit stream, but
    cmd/service/main.go:16 always passes the deposit stream).  Kept as a
    documented variant: ``is_deposit_stream=False`` flips the sign.
    """
    if is_deposit_stream:
        return deposits
    return deposits.withColumn("amount", -F.col("amount"))
