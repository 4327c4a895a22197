"""Top-level job entry — StreamSentinelJob.main parity (SURVEY §3.1).

Stage-for-stage with the reference (StreamSentinelJob.java:61-93):
config resolution from env (1) → rule load + validate, empty set fatal
(2) → health server start (3) → session setup (4) → pipeline
construction (5) → streaming execution (6). The Spark twin swaps the
Flink JobGraph for a Structured Streaming query and the Flink
checkpoint config for a checkpoint location (T4).
"""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from stream_sentinel_spark.config import EngineConfig
from stream_sentinel_spark.health import HealthServer
from stream_sentinel_spark.loader import load_rules
from stream_sentinel_spark.metrics import SentinelMetricsListener
from stream_sentinel_spark.streaming import (
    compile_rules_streaming,
    parse_events,
    read_kafka_stream,
    write_alerts_kafka,
)

log = logging.getLogger("stream_sentinel_spark.job")

#: Default open event schema for Kafka JSON payloads when none is
#: supplied: the reference treats events as schema-free maps; a string
#: map keeps every top-level field addressable (coercion happens at rule
#: compile time, Event.java:101-125 semantics).
DEFAULT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.StringType()),
        T.StructField("amount", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("merchantId", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("deviceId", T.StringType()),
    ]
)


def build_session(config: EngineConfig, app_name: str = "stream-sentinel-spark") -> SparkSession:
    """Stage 4: session with parallelism parity (FLINK_PARALLELISM →
    shuffle partitions; Spark parallelizes within stages on its own)."""
    return (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(config.parallelism, 1) * 32))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def run_job(
    spark: SparkSession | None = None,
    config: EngineConfig | None = None,
    schema: T.StructType = DEFAULT_EVENT_SCHEMA,
    *,
    key_field: str | None = None,
    time_col: str = "ingest_ts",
    events=None,
    start_query=None,
    rules_path: str | None = None,
    await_termination: bool = False,
) -> StreamingQuery:
    """Assemble and start the full Kafka→rules→Kafka pipeline.

    ``events`` (a pre-built streaming DataFrame) and ``start_query``
    (``alerts -> StreamingQuery``) inject alternative sources/sinks —
    file/memory streams for tests and replay; the defaults are the
    reference's Kafka-to-Kafka shape. Returns the running query (caller
    owns lifecycle unless ``await_termination``)."""
    # 1. config resolution (JobConfig.fromEnvironment parity)
    config = config or EngineConfig.from_environment()
    config.validate()
    # 2. rule load; empty rule set fatal (StreamSentinelJob.java:70-75)
    rules = load_rules(rules_path)
    if not rules:
        raise RuntimeError(
            "No detection rules configured — refusing to start"
        )
    log.info("Loaded %d detection rules", len(rules))
    # 3. health server BEFORE the (slow) session build, as the reference
    # starts it before the job (StreamSentinelJob.java:78-81) — k8s
    # probes must see /health during the 10-30 s SparkContext bring-up.
    # The listener needs no session, so /metrics is live immediately too
    # (zero counters until the stream starts), serving the snapshot in
    # Prometheus text format (SentinelMetrics.java:25-51 parity).
    listener = SentinelMetricsListener()
    health = HealthServer(metrics_source=listener.snapshot)
    health.start(config.health_port)
    # 4. session + metrics
    spark = spark or build_session(config)
    spark.streams.addListener(listener)
    # 5-6. pipeline construction + execution
    if events is None:
        raw = read_kafka_stream(spark, config)
        events = parse_events(raw, schema, time_col=None)  # ingestion time
    alerts = compile_rules_streaming(
        events,
        rules,
        key_field=key_field or config.default_key_field,
        time_col=time_col,
    )
    query = (
        start_query(alerts) if start_query else write_alerts_kafka(alerts, config)
    )
    log.info("Pipeline started: %s", query.name)
    if await_termination:
        query.awaitTermination()
    return query


def main() -> None:  # pragma: no cover - requires a Kafka cluster
    logging.basicConfig(level=logging.INFO)
    run_job(await_termination=True)


if __name__ == "__main__":  # pragma: no cover
    main()
