"""Change-data-capture fold + MERGE — the lakehouse upsert primitive
(Delta/Iceberg ``MERGE INTO`` semantics, expressed as a plan): a keyed
changelog of upserts and tombstones is folded to its final op per key,
then merged into a base snapshot with last-write-wins — delta rows
override, tombstones delete, untouched snapshot rows carry through.

Last-write-wins is ASSOCIATIVE: fold(snapshot ∪ delta) ≡
merge(fold(snapshot), fold(delta)).  The registered query exploits that
as its oracle — the engine runs the staged snapshot+merge plan while
the oracle computes the one-pass global fold, so every driver run
proves the merge preserves semantics (the same oracle trick the salted
aggregation queries use).

Scale shape: the fold is one keyed row_number window (per-key state =
1 row); the merge is one (key)-keyed full-outer equi-join of two
key-unique frames — at 100 TB both sides shuffle once on the merge
key, and a bucketed/partitioned snapshot table makes the join
co-located (the compaction layout operators in functions/layout.py
are the companion piece).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: changelog op encoding over the events table: a key's row is an
#: UPSERT of ``value`` unless the op column says tombstone
TOMBSTONE_OP = "error"


def changelog_state(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    op_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Final op per key: (key, op, last_value, last_ts_us), the fold of
    a changelog under last-write-wins with the deterministic
    (ts, order_cols) tie-break.  Tombstone rows are KEPT (op column
    says so) — merge decides what a tombstone means."""
    w = Window.partitionBy(key_col).orderBy(
        F.desc(ts_col), *[F.desc(c) for c in order_cols]
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            key_col,
            F.col(op_col).alias("op"),
            F.col(value_col).alias("last_value"),
            F.unix_micros(F.col(ts_col)).alias("last_ts_us"),
        )
    )


def changelog_merge(
    snapshot: DataFrame,
    delta: DataFrame,
    key_col: str = "user_id",
    tombstone: str = TOMBSTONE_OP,
) -> DataFrame:
    """MERGE a folded delta into a key-unique snapshot.

    ``snapshot``: (key, last_value, last_ts_us) — live rows only.
    ``delta``: output of ``changelog_state`` (op column included).

    Row outcome: delta upsert wins over any snapshot row; delta
    tombstone deletes the key; keys untouched by the delta carry their
    snapshot row.  Output tags each surviving row with its side
    (src = 'delta' | 'snapshot')."""
    d = delta.select(
        key_col,
        F.col("op").alias("_d_op"),
        F.col("last_value").alias("_d_value"),
        F.col("last_ts_us").alias("_d_ts_us"),
    )
    merged = snapshot.join(d, key_col, "full_outer")
    live = merged.filter(
        F.when(F.col("_d_op").isNotNull(), F.col("_d_op") != tombstone).otherwise(
            F.col("last_value").isNotNull() | F.col("last_ts_us").isNotNull()
        )
    )
    from_delta = F.col("_d_op").isNotNull()
    return live.select(
        key_col,
        F.when(from_delta, F.col("_d_value")).otherwise(F.col("last_value")).alias(
            "last_value"
        ),
        F.when(from_delta, F.col("_d_ts_us")).otherwise(F.col("last_ts_us")).alias(
            "last_ts_us"
        ),
        F.when(from_delta, F.lit("delta")).otherwise(F.lit("snapshot")).alias("src"),
    )
