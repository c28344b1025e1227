"""Topology orchestration (SURVEY.md §2.5, T1-T4).

The reference runs its three processor groups concurrently in one process
under an errgroup with signal-driven shutdown (cmd/processor/main.go:18-55)
and scales by running more copies.  The Spark analog: N StreamingQuery
instances on one SparkSession — each query is a "processor group" with its
own checkpoint (recovery = checkpoint + state store restore, the analog of
replaying the <group>-table topic), and horizontal scale comes from
executors/shuffle partitions instead of process copies.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from depositaja_spark.streaming.detector_state import exact_detector
from depositaja_spark.streaming.pipeline import (
    deposits_stream_from_dir,
    streaming_exact_dedup,
    streaming_flag_events,
    streaming_window_received,
)
from depositaja_spark.streaming.serving import ServingTables


@dataclass
class Topology:
    """The whole reference dataflow as concurrent streaming queries.

    collector/detector/flagger flags mirror cmd/processor/main.go:19-21 —
    each can be enabled independently, exactly like the reference's
    ``-collector -detector -flagger`` CLI switches."""

    spark: SparkSession
    events_dir: str
    work_dir: str
    collector: bool = True
    detector: bool = True
    flagger: bool = True
    exact_semantics: bool = False
    #: drop redelivered deposits (by seq = event id) before any state —
    #: upgrades the reference's at-least-once contract (which double-counts
    #: on broker redelivery, SURVEY.md §4.2) to effective exactly-once at
    #: the operator level; watermark-bounded fingerprints
    dedup_input: bool = False
    queries: list[StreamingQuery] = field(default_factory=list)

    def __post_init__(self):
        self.serving = ServingTables(self.spark, os.path.join(self.work_dir, "serving"))

    def _ckpt(self, name: str) -> str:
        return os.path.join(self.work_dir, "checkpoints", name)

    def start(self, trigger: dict | None = None) -> list[StreamingQuery]:
        """Start the enabled processor groups.  ``trigger`` defaults to
        availableNow (drain-and-stop, used in tests); pass e.g.
        ``{"processingTime": "5 seconds"}`` for continuous operation."""
        trigger = trigger or {"availableNow": True}
        deposits = deposits_stream_from_dir(self.spark, self.events_dir)
        if self.dedup_input:
            deposits = streaming_exact_dedup(deposits, keys=("seq",))

        if self.collector:
            # collector group: maintain the balance serving table (the
            # engine's compacted analog of the balance <group>-table)
            q = (
                deposits.writeStream.foreachBatch(self.serving.balance_sink())
                .option("checkpointLocation", self._ckpt("collector"))
                .trigger(**trigger)
                .start()
            )
            self.queries.append(q)

        if self.detector and self.flagger:
            # detector group emits flag events; flagger group folds them.
            # As in the reference the two communicate through an event
            # stream — here the detector's output feeds the fold directly
            # (same dataflow, one less broker round-trip; with Kafka
            # configured, kafka.kafka_sink publishes the intermediate
            # stream unchanged).
            if self.exact_semantics:
                flag_events = exact_detector(deposits).select(
                    "wallet_id", "flag_removed", "rolling_period_start_unix", "seq"
                )
            else:
                flag_events = streaming_flag_events(
                    streaming_window_received(deposits)
                )
            q = (
                flag_events.writeStream.foreachBatch(self.serving.flags_sink())
                .option("checkpointLocation", self._ckpt("detector_flagger"))
                .trigger(**trigger)
                .start()
            )
            self.queries.append(q)

        return self.queries

    def await_all(self, timeout: int = 300) -> None:
        for q in self.queries:
            q.awaitTermination(timeout)

    def stop(self) -> None:
        """Graceful shutdown — the SIGINT/SIGTERM path of the reference."""
        for q in self.queries:
            if q.isActive:
                q.stop()

    def check(self, wallet_id: str) -> dict:
        """T4 service read path over the serving tables."""
        return self.serving.check(wallet_id)
