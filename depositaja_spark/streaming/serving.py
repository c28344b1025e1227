"""Serving tables: the engine's answer to Goka views (queryable state).

The reference serves reads from full local replicas of the log-compacted
group-table topics (balance view service/service.go:43-47, flagger view
:49-53).  Spark has no queryable state primitive, so each streaming query
maintains a compacted serving table via ``foreachBatch`` upsert:

    new_state = latest_by_key(old_state ∪ micro_batch)

written atomically (write-new-then-rename).  Reads are plain DataFrame
lookups against the current version — eventually consistent with the
stream exactly like the reference's asynchronously-tailed views.  On a
real deployment the upsert target is a Delta/Iceberg table (MERGE INTO)
partitioned by key range; the local-parquet swap here keeps identical
semantics without those jars.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ServingTables:
    """Compacted latest-per-key tables maintained from micro-batches."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame | None:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        return self.spark.read.parquet(path)

    def upsert_latest(
        self, name: str, batch: DataFrame, key: str, order: str, epoch_id: int | None = None
    ) -> None:
        """Compact: keep the max-``order`` row per ``key`` across the old
        state and the new batch — the same last-write-wins fold Goka
        applies when replaying a compacted table topic.  Idempotent by
        construction (max_by re-applied to the same rows is a no-op), so
        the epoch marker here only short-circuits replays, it isn't needed
        for correctness."""
        current = self.read(name)
        merged = batch if current is None else current.unionByName(batch)
        value_cols = [c for c in merged.columns if c != key]
        latest = (
            merged.groupBy(key)
            .agg(F.max_by(F.struct(*value_cols), F.col(order)).alias("v"))
            .select(key, "v.*")
        )
        self._swap_in(name, latest, epoch_id=epoch_id)

    # --- foreachBatch hooks ---------------------------------------------

    def _last_epoch(self, name: str) -> int:
        """Epoch of the last successfully applied micro-batch, recorded
        INSIDE the table directory (underscore-prefixed, so Spark's parquet
        reader ignores it) — the marker and the data it describes swap in
        one atomic rename, so they can never disagree."""
        marker = os.path.join(self._path(name), "_epoch")
        if not os.path.exists(marker):
            return -1
        with open(marker) as f:
            return int(f.read().strip())

    def _swap_in(self, name: str, df: DataFrame, epoch_id: int | None = None) -> None:
        """Write ``df`` to a temp dir (stamping the epoch marker) and
        atomically rename it over the current table."""
        tmp = self._path(f".{name}.{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(tmp)
        if epoch_id is not None:
            with open(os.path.join(tmp, "_epoch"), "w") as f:
                f.write(str(epoch_id))
        final = self._path(name)
        old = self._path(f".{name}.old.{uuid.uuid4().hex}")
        if os.path.exists(final):
            os.rename(final, old)
        os.rename(tmp, final)
        if os.path.exists(old):
            shutil.rmtree(old)

    def balance_sink(self):
        """Micro-batch of deposits → running balance table.  The batch is
        pre-aggregated per key, then merged additively (sums compose).

        Additive merge is NOT naturally idempotent, so sink-replay after a
        failure (table write succeeded, checkpoint commit didn't) would
        double-count the replayed batch.  foreachBatch epoch ids are
        monotonically increasing and stable across restarts, so the sink
        records the last applied epoch inside the table directory and
        skips any epoch ≤ it — the transactional-sink pattern Spark's docs
        prescribe for exactly-once foreachBatch."""

        def sink(batch: DataFrame, epoch_id: int) -> None:
            if epoch_id <= self._last_epoch("balance"):
                return  # replayed micro-batch: already folded into the table
            delta = batch.groupBy("wallet_id").agg(
                F.sum("amount").alias("balance"), F.max("seq").alias("seq")
            )
            current = self.read("balance")
            if current is not None:
                delta = (
                    current.unionByName(delta)
                    .groupBy("wallet_id")
                    .agg(F.sum("balance").alias("balance"), F.max("seq").alias("seq"))
                )
            self._swap_in("balance", delta, epoch_id=epoch_id)

        return sink

    def flags_sink(self):
        """Micro-batch of FlagEvents → latest-flag table (A4 fold,
        reference flagger/flagger.go:40-57)."""

        def sink(batch: DataFrame, epoch_id: int) -> None:
            if epoch_id <= self._last_epoch("flags"):
                return  # replay: fold is idempotent, skipping just saves IO
            folded = (
                batch.groupBy("wallet_id")
                .agg(
                    F.max_by(
                        F.struct("flag_removed", "rolling_period_start_unix"),
                        F.col("seq"),
                    ).alias("last"),
                    F.max("seq").alias("seq"),
                )
                .select(
                    "wallet_id",
                    (~F.col("last.flag_removed")).alias("flagged"),
                    F.when(F.col("last.flag_removed"), F.lit(0).cast("long"))
                    .otherwise(F.col("last.rolling_period_start_unix"))
                    .alias("rolling_period_start_unix"),
                    "seq",
                )
            )
            self.upsert_latest("flags", folded, key="wallet_id", order="seq", epoch_id=epoch_id)

        return sink

    # --- the read path (J1) ----------------------------------------------

    def check(self, wallet_id: str) -> dict:
        """GET /check/{wallet_id} (reference service/service.go:115-153):
        balance ⋈ flags with zero-value defaults, always one answer —
        including for wallets never seen."""
        balance = self.read("balance")
        flags = self.read("flags")
        bal_row = None
        if balance is not None:
            bal_row = balance.filter(F.col("wallet_id") == wallet_id).collect()
        flag_row = None
        if flags is not None:
            flag_row = flags.filter(F.col("wallet_id") == wallet_id).collect()
        return {
            "wallet_id": wallet_id,
            "balance": float(bal_row[0]["balance"]) if bal_row else 0.0,
            "above_threshold": bool(flag_row[0]["flagged"]) if flag_row else False,
        }
