"""Streaming sources — S1/S2/S3 and T1/T2 on Structured Streaming.

Kafka source parity (StreamSentinelJob.java:106-118): value-only JSON,
earliest offsets, consumer group. JSON deserialize parity
(EventDeserializationSchema.java:30-42): malformed bytes → NULL row,
dropped, never crashes — ``from_json`` in PERMISSIVE mode gives exactly
that; ingestion time stamped at the source
(EventDeserializationSchema.java:36).

Watermark (StreamSentinelJob.java:116-117): 5 s bounded out-of-orderness.
Structured Streaming's global watermark subsumes Flink's per-partition
idleness knob (T2) — no separate config needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_sentinel_spark.config import EngineConfig

#: Default out-of-orderness — StreamSentinelJob.java:116 (5 s).
DEFAULT_WATERMARK = "5 seconds"

#: Ingestion-time column stamped on every parsed event (S2).
INGEST_COL = "ingest_ts"


def read_kafka_stream(spark: SparkSession, config: EngineConfig) -> DataFrame:
    """S1 — raw Kafka stream: value bytes from the input topic, earliest
    offsets (StreamSentinelJob.java:108-113).

    Requires the ``spark-sql-kafka-0-10`` connector on the classpath
    (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`` at
    deploy time); raises a clear error when it is absent."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", config.kafka_bootstrap_servers)
            .option("subscribe", config.kafka_input_topic)
            .option("startingOffsets", "earliest")
            .option("kafka.group.id", config.kafka_group_id)
            .load()
        )
    except Exception as exc:  # AnalysisException: data source not found
        if "kafka" in str(exc).lower():
            raise RuntimeError(
                "Kafka connector not on the classpath — submit with "
                "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
                f"{spark.version}"
            ) from exc
        raise


def parse_events(
    raw: DataFrame,
    schema: T.StructType,
    *,
    value_col: str = "value",
    time_col: str | None = None,
    watermark: str | None = DEFAULT_WATERMARK,
) -> DataFrame:
    """S2+S3 — bytes → typed event rows.

    ``from_json`` of malformed/empty input yields an all-NULL struct; the
    struct-is-null filter reproduces the drop-never-crash semantics
    (EventDeserializationSchema.java:38-41 + StreamSentinelJob.java:123).
    Stamps ``ingest_ts`` (ingestion time axis,
    EventDeserializationSchema.java:36); when ``time_col`` names an
    event-time column, the watermark rides on it (deterministic mode,
    SURVEY §7.4.3), else on ingestion time.
    """
    # from_json in Spark 3+ yields a row-of-nulls (not a NULL struct) for
    # malformed input, so the drop decision needs an explicit corrupt-
    # record column: non-null there ⇔ the bytes did not parse. A parsed
    # object with unknown/missing fields leaves it NULL
    # (FAIL_ON_UNKNOWN_PROPERTIES=false parity).
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = raw.select(
        F.from_json(
            F.col(value_col).cast("string"),
            with_corrupt,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("e"),
        F.current_timestamp().alias(INGEST_COL),
    )
    events = (
        parsed.filter(F.col("e").isNotNull() & F.col("e._corrupt_record").isNull())
        .select("e.*", INGEST_COL)
        .drop("_corrupt_record")
    )
    wm_col = time_col if time_col else INGEST_COL
    if watermark:
        events = events.withWatermark(wm_col, watermark)
    return events


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    fmt: str = "parquet",
    time_col: str | None = "ts",
    watermark: str | None = DEFAULT_WATERMARK,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source — the Kafka-free twin used for tests
    and batch-replay: each new file in ``path`` is a micro-batch."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(path).withColumn(INGEST_COL, F.current_timestamp())
    wm_col = time_col if time_col else INGEST_COL
    if watermark:
        df = df.withWatermark(wm_col, watermark)
    return df
