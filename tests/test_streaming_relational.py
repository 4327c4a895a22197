"""Streaming relational operators (streaming/relational.py): watermark-
bounded dedup and stream-stream interval joins, checked against their
batch twins on the same data."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.streaming import (
    dedup_events,
    interval_join,
    read_file_stream,
    run_available_now,
)


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 12, m, s)


SCHEMA = "event_id long, ts timestamp, user_id long, value double"


@pytest.fixture()
def dup_events(spark, tmp_path):
    # event 2 is delivered twice (same id, same payload — an
    # at-least-once redelivery); event 5 twice across files
    rows = [
        (1, _ts(0), 10, 1.0),
        (2, _ts(1), 10, 2.0),
        (2, _ts(1), 10, 2.0),
        (3, _ts(2), 11, 3.0),
    ]
    rows2 = [
        (5, _ts(3), 11, 5.0),
        (5, _ts(3), 11, 5.0),
        (6, _ts(4), 12, 6.0),
    ]
    path = str(tmp_path / "events")
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(path)
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    return path, spark.createDataFrame(rows + rows2, SCHEMA)


def test_dedup_stream_drops_redeliveries(spark, dup_events):
    path, batch = dup_events
    stream = read_file_stream(spark, path, batch.schema, time_col="ts", watermark=None)
    out = run_available_now(
        dedup_events(stream, ["event_id"], watermark="10 minutes"),
        query_name="dedup_t",
    )
    assert sorted(r.event_id for r in out) == [1, 2, 3, 5, 6]


def test_dedup_batch_twin_same_rows(spark, dup_events):
    _, batch = dup_events
    out = dedup_events(batch, ["event_id"])
    assert sorted(r.event_id for r in out.collect()) == [1, 2, 3, 5, 6]


@pytest.fixture()
def impression_click(spark):
    impressions = spark.createDataFrame(
        [
            (100, _ts(0), 1, 0.0),   # clicked at +5m → joins
            (101, _ts(0), 2, 0.0),   # clicked at +20m → outside window
            (102, _ts(10), 1, 0.0),  # never clicked
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    clicks = spark.createDataFrame(
        [
            (900, _ts(5), 1, 1.0),
            (901, _ts(20), 2, 1.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    return impressions, clicks


def test_interval_join_batch(spark, impression_click):
    imp, clk = impression_click
    out = interval_join(
        imp, clk, "user_id", lower="0 seconds", upper="10 minutes"
    ).collect()
    assert [(r.event_id, r.event_id_r) for r in out] == [(100, 900)]


def test_interval_join_stream_stream(spark, impression_click, tmp_path):
    imp, clk = impression_click
    pi, pc = str(tmp_path / "imp"), str(tmp_path / "clk")
    imp.coalesce(1).write.parquet(pi)
    clk.coalesce(1).write.parquet(pc)
    si = read_file_stream(spark, pi, imp.schema, time_col="ts", watermark=None)
    sc = read_file_stream(spark, pc, clk.schema, time_col="ts", watermark=None)
    out = run_available_now(
        interval_join(
            si, sc, "user_id",
            lower="0 seconds", upper="10 minutes", watermark="30 minutes",
        ),
        query_name="ij_t",
    )
    assert [(r.event_id, r.event_id_r) for r in out] == [(100, 900)]


def test_interval_join_negative_lower_bound(spark, impression_click):
    # click up to 6 minutes BEFORE the impression also matches
    imp, clk = impression_click
    out = interval_join(
        clk, imp, "user_id", lower="-6 minutes", upper="0 seconds"
    ).collect()
    assert [(r.event_id, r.event_id_r) for r in out] == [(900, 100)]


def test_interval_join_schema_flat(spark, impression_click):
    imp, clk = impression_click
    cols = interval_join(imp, clk, "user_id").columns
    assert cols.count("user_id") == 1
    assert "ts_r" in cols and "event_id_r" in cols


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Sketches are streaming-native: the HLL register table is a plain
    groupBy max-aggregation, so the SAME operator runs on a stream
    (complete mode) and produces the register-identical sketch — the
    incremental distinct-count path (merge new batches with max) with
    zero extra code."""
    from pyspark.sql import functions as F

    from stream_sentinel_spark.operators.sketches import hll_registers
    from stream_sentinel_spark.streaming.sources import read_file_stream

    df = spark.createDataFrame(
        [(i % 5, f"v{i % 997}") for i in range(4000)], "g int, v string"
    )
    path = str(tmp_path / "hll_src")
    df.write.mode("overwrite").parquet(path)

    batch = {
        (r["g"], r["register"]): r["max_rho"]
        for r in hll_registers(df, ["g"], "v").collect()
    }
    stream = read_file_stream(spark, path, df.schema, time_col=None, watermark=None)
    agg = hll_registers(stream, ["g"], "v")
    q = (
        agg.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["g"], r["register"]): r["max_rho"]
        for r in spark.table("hll_stream").collect()
    }
    assert streamed == batch and len(batch) > 0


# ---------------------------------------------------------------------------
# streaming session windows (x93's machinery): append-mode emission of
# gap-merged sessions equals the batch session_window plan
# ---------------------------------------------------------------------------


def test_streaming_session_windows_match_batch(spark, tmp_path):
    import os

    from stream_sentinel_spark.operators.windows import session_windows

    # two keys; key 10 has two sessions separated by > gap (10 min),
    # key 11 one session whose events arrive OUT OF ORDER across files
    rows1 = [
        (1, _ts(0), 10, 1.0),
        (2, _ts(2), 10, 1.0),     # merges with event 1 (gap 2 min)
        (4, _ts(30), 10, 1.0),    # new session (gap 28 min > 10)
        (6, _ts(6), 11, 1.0),
    ]
    rows2 = [
        (5, _ts(4), 11, 1.0),     # out-of-order: EARLIER than event 6
    ]
    sentinel = [(99, _ts(59), -1, None)]  # watermark push past all ends
    path = str(tmp_path / "sess")
    files = []
    for i, chunk in enumerate((rows1, rows2, sentinel)):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
    # strictly increasing mtimes so maxFilesPerTrigger honors file order
    parts = sorted(
        (f for f in os.listdir(path) if f.endswith(".parquet")),
        key=lambda f: os.stat(os.path.join(path, f)).st_mtime,
    )
    for i, f in enumerate(parts):
        full = os.path.join(path, f)
        st = os.stat(full)
        os.utime(full, (st.st_atime, st.st_mtime + 2.0 * i))

    batch = spark.createDataFrame(rows1 + rows2, SCHEMA)
    stream = (
        read_file_stream(
            spark, path, batch.schema, time_col="ts", watermark=None,
            max_files_per_trigger=1,
        )
        .withColumn("ts_ms", F.timestamp_millis(F.unix_millis("ts")))
        .withWatermark("ts_ms", "5 seconds")
    )
    got = session_windows(
        stream, F.col("user_id").cast("string"), "ts_ms", "10 minutes"
    )
    q = (
        got.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    expected = {
        tuple(r)
        for r in session_windows(
            batch.withColumn(
                "ts_ms", F.timestamp_millis(F.unix_millis("ts"))
            ),
            F.col("user_id").cast("string"),
            "ts_ms",
            "10 minutes",
        ).collect()
    }
    # the sentinel's own session never passes the watermark — emitted
    # rows are exactly the real sessions, no filtering needed
    assert streamed == expected
    assert len(expected) == 3  # (10: two sessions), (11: one merged)
