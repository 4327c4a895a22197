"""Structured Streaming surface — sources, stateful detectors, sinks.

The streaming twin of the batch rule compiler (SURVEY §7.0): one
rule-compilation codepath; per-event sliding windows (W1/W2) swap the
batch window-frame plans for a keyed `applyInPandasWithState` processor
with identical semantics (tests/test_streaming_parity.py).
"""

from stream_sentinel_spark.streaming.job import (
    compile_rules_streaming,
    run_available_now,
    write_alerts_files,
    write_alerts_kafka,
)
from stream_sentinel_spark.streaming.sources import (
    DEFAULT_WATERMARK,
    INGEST_COL,
    parse_events,
    read_file_stream,
    read_kafka_stream,
)
from stream_sentinel_spark.streaming.exactly_once import (
    kafka_publisher,
    write_alerts_exactly_once,
)
from stream_sentinel_spark.streaming.relational import dedup_events, interval_join
from stream_sentinel_spark.streaming.state import stateful_alerts
from stream_sentinel_spark.streaming.upsert import (
    compact_upsert_log,
    consumer_lag,
    follow_upsert_changes,
    maintain_agg_view,
    read_agg_view,
    read_consumer_offset,
    read_upsert_changes,
    read_upsert_history,
    read_upsert_snapshot,
    recover_upsert_ingest,
    run_upsert_ingest,
    upsert_agg_delta,
)

__all__ = [
    "DEFAULT_WATERMARK",
    "INGEST_COL",
    "compact_upsert_log",
    "compile_rules_streaming",
    "consumer_lag",
    "dedup_events",
    "follow_upsert_changes",
    "interval_join",
    "kafka_publisher",
    "maintain_agg_view",
    "parse_events",
    "read_agg_view",
    "read_consumer_offset",
    "read_file_stream",
    "read_kafka_stream",
    "read_upsert_changes",
    "read_upsert_history",
    "read_upsert_snapshot",
    "recover_upsert_ingest",
    "run_available_now",
    "run_upsert_ingest",
    "stateful_alerts",
    "upsert_agg_delta",
    "write_alerts_exactly_once",
    "write_alerts_files",
    "write_alerts_kafka",
]
