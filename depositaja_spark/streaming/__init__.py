"""Structured Streaming parity: the reference's continuous path.

The reference runs three Goka processors over Kafka (collector, detector,
flagger — reference cmd/processor/main.go:18-55); here each maps to a
streaming query over a shared SparkSession:

* collector  → the raw event log IS the history (the reference already
  computes balance lazily from its stored list at read time,
  service/service.go:137-140 — we keep the log as source of truth and
  aggregate on read/serve, avoiding unbounded per-key operator state).
* detector   → two variants: watermarked event-time tumbling window
  (deterministic, pipeline.py) and the faithful processing-time
  add-then-maybe-reset state machine (detector_state.py).
* flagger    → latest-value fold maintained by foreachBatch upsert into a
  compacted serving table (serving.py) — the analog of Goka's
  log-compacted <group>-table topic + local store.
"""

from depositaja_spark.streaming.pipeline import (
    deposits_stream_from_dir,
    streaming_distinct_users,
    streaming_exact_dedup,
    streaming_window_received,
    streaming_flag_events,
)
from depositaja_spark.streaming.corpus import streaming_corpus_intake
from depositaja_spark.streaming.detector_state import exact_detector
from depositaja_spark.streaming.serving import ServingTables

__all__ = [
    "deposits_stream_from_dir",
    "streaming_distinct_users",
    "streaming_exact_dedup",
    "streaming_corpus_intake",
    "streaming_window_received",
    "streaming_flag_events",
    "exact_detector",
    "ServingTables",
]
