"""Batch sources: the driver's parquet tables and reference-style JSON
event corpora.

S1's batch twin (SURVEY §2.1): ``spark.read.parquet``. The JSON path
reproduces S2's semantics — permissive parse, malformed → NULL row
dropped, never crashes (EventDeserializationSchema.java:30-42) — via the
JSON datasource's PERMISSIVE mode + an isNotNull filter (S3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Driver-generated tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Reference event corpus schema (examples/sample-events.json:1-41).
SAMPLE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("merchantId", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("deviceId", T.StringType()),
    ]
)


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright (PARQUET_TYPE_ILLEGAL) — the driver's ``events.ts``
    is one. Detected from the footer so the workaround is general."""
    try:
        import os

        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            parts = [p for p in os.listdir(path) if p.endswith(".parquet")]
            if not parts:
                return []
            target = os.path.join(path, parts[0])
        schema = pq.read_schema(target)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table. TIMESTAMP(NANOS) columns are read via the
    ``nanosAsLong`` escape hatch (runtime-settable) and truncated to
    microsecond timestamps — the same truncation DuckDB's µs timestamps
    apply, so oracle comparisons agree."""
    path = f"{sf_dir}/{name}.parquet"
    # Read unadjusted parquet timestamps as instants (TimestampType), not
    # TIMESTAMP_NTZ: stored micros == the UTC instant, which keeps
    # unix_millis() available and every epoch comparison timezone-proof.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    nanos_cols = _nanos_timestamp_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        # integer `div`, NOT `/`: epoch nanos ≈ 1.7e18 exceeds double's
        # 53-bit mantissa, so float division shifts timestamps by
        # hundreds of microseconds before the floor
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Expose all driver tables as temp views so the engine's SQL surface
    (`spark.sql`) works directly over the corpus — mirrors how the DuckDB
    oracle pre-registers them."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def events_from_json(
    spark: SparkSession, path: str, schema: T.StructType = SAMPLE_EVENT_SCHEMA
) -> DataFrame:
    """Read a reference-style JSON event corpus with S2/S3 semantics:
    permissive parse, corrupt records dropped, event `timestamp` parsed
    as the deterministic time axis into ``ts`` (SURVEY §7.4.3)."""
    # copy, don't .add(): StructType.add mutates the receiver in place,
    # which would silently pollute the caller's schema object
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = spark.read.schema(with_corrupt).option("mode", "PERMISSIVE").option(
        "multiLine", "true"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    return (
        df.filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
        .withColumn("ts", F.to_timestamp(F.col("timestamp")))
    )


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    drop_malformed: bool = True,
) -> DataFrame:
    """Line-delimited JSON with the engine's S2/S3 malformed-row
    contract: permissive parse against an EXPLICIT schema (schema
    inference is a second full scan and non-deterministic under schema
    drift — never at 100 TB), and malformed lines dropped via the
    corrupt-record column rather than failing the job. Set
    ``drop_malformed=False`` to keep them (column ``_corrupt_record``)
    for a quarantine sink."""
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if drop_malformed:
        return df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    drop_malformed: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with the same contract as :func:`load_jsonl`: explicit
    schema, permissive mode, malformed rows (wrong arity, uncastable
    cells) dropped via the corrupt-record column instead of NULL-ing
    silently (DROPMALFORMED hides the loss) or failing (FAILFAST).
    Extra datasource options pass through (sep, quote, timestampFormat,
    ...)."""
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    reader = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", str(header).lower())
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.csv(path)
    if drop_malformed:
        return df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df
