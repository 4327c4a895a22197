"""S2/S3 error-isolation semantics (SURVEY §2.1): malformed input is
dropped, never crashes the pipeline — EventDeserializationSchema.java:
30-42 (null/empty bytes → null; bad JSON → logged, null; filtered at
StreamSentinelJob.java:123)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from stream_sentinel_spark.sources.batch import SAMPLE_EVENT_SCHEMA, events_from_json
from stream_sentinel_spark.streaming.sources import parse_events

GOOD = {"userId": "u1", "amount": 12.5, "timestamp": "2024-01-01T00:00:00Z"}


def test_batch_json_drops_malformed(spark, tmp_path):
    path = tmp_path / "events.json"
    lines = [
        json.dumps(GOOD),
        "{not valid json",                      # malformed → dropped
        "",                                      # empty → dropped
        json.dumps({**GOOD, "userId": "u2"}),
        json.dumps({"unknownField": 1}),         # unknown fields tolerated
    ]
    path.write_text("\n".join(lines) + "\n")
    schema_before = SAMPLE_EVENT_SCHEMA.jsonValue()
    events_from_json(spark, str(path), SAMPLE_EVENT_SCHEMA)
    # the reader must NOT mutate the caller's schema (StructType.add
    # mutates in place — regression guard)
    assert SAMPLE_EVENT_SCHEMA.jsonValue() == schema_before
    # multiLine mode reads whole-file JSON; for line-delimited re-read
    # with the same permissive-drop recipe
    with_corrupt = T.StructType(
        list(SAMPLE_EVENT_SCHEMA.fields)
        + [T.StructField("_corrupt_record", T.StringType())]
    )
    rows = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(path))
        .filter(F.col("_corrupt_record").isNull())
        .drop("_corrupt_record")
        .collect()
    )
    user_ids = [r["userId"] for r in rows]
    assert "u1" in user_ids and "u2" in user_ids
    # the unknown-field row survives as an all-NULL-payload event (parse
    # succeeded; fields absent) — detectors then skip it, never crash
    assert len(rows) == 3


def test_streaming_parse_drops_malformed(spark, tmp_path):
    """parse_events over raw value bytes: malformed → NULL struct →
    filtered; valid rows keep their fields and gain ingest_ts."""
    raw = spark.createDataFrame(
        [(json.dumps(GOOD).encode(),), (b"\x00\xffgarbage",), (None,)],
        T.StructType([T.StructField("value", T.BinaryType())]),
    )
    parsed = parse_events(raw, SAMPLE_EVENT_SCHEMA, watermark=None)
    rows = parsed.collect()
    assert len(rows) == 1
    assert rows[0]["userId"] == "u1"
    assert rows[0]["ingest_ts"] is not None
