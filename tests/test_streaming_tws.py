"""transformWithStateInPandas backend ≡ applyInPandasWithState backend.

Both stateful APIs share the SAME per-batch evaluation function
(`state._run_rules_over_batch`), so this test pins what the sharing
cannot: the state round-trip (blob in/out of the typed ValueState), the
output schema plumbing, and the RocksDB provider requirement. Identical
input through both backends must produce the identical alert set, which
transitively ties the TWS path to the batch plan and the DuckDB oracle
(tests/test_streaming_parity.py).
"""

from __future__ import annotations

import pytest

from stream_sentinel_spark.rules import DetectionRule
from stream_sentinel_spark.sources.batch import load_table
from stream_sentinel_spark.streaming import read_file_stream, run_available_now
from stream_sentinel_spark.streaming.state import stateful_alerts, stateful_alerts_tws

SF_DIR = "/root/testdata/sf0.001"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

RULES = [
    DetectionRule(
        name="high_rate", type="rate", key_field="user_id",
        window_seconds=86_400, threshold=4,
    ),
    DetectionRule(
        name="unusual_amount", type="statistical", key_field="user_id",
        field="amount", window_size=20, deviation_factor=2.5, decimal_scale=2,
    ),
]


def _alert_key(row):
    return (
        row["rule_name"], row["key"], row["alert_ts"], row["details"],
        row["rule_index"],
    )


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tws") / "events")
    ev = load_table(spark, SF_DIR, "events")
    ev.write.mode("overwrite").parquet(path)
    return path, ev


def _run(spark, events_src, backend, tag):
    path, ev = events_src
    stream = read_file_stream(spark, path, ev.schema, time_col="ts", watermark=None)
    alerts = backend(
        stream, RULES, key_field="user_id", time_col="ts", order_cols=("event_id",)
    )
    return run_available_now(alerts, query_name=f"tws_{tag}")


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_gate_is_actionable(spark, events_src):
    """Without the protobuf dependency the backend must fail at plan
    BUILD time with instructions, not mid-query with a worker crash."""
    if _has_protobuf():
        pytest.skip("protobuf installed — gate inactive")
    path, ev = events_src
    stream = read_file_stream(spark, path, ev.schema, time_col="ts", watermark=None)
    with pytest.raises(RuntimeError, match="protobuf"):
        stateful_alerts_tws(
            stream, RULES, key_field="user_id", time_col="ts",
            order_cols=("event_id",),
        )


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf package "
    "(absent in this container); the backend is gated with an "
    "actionable error and exercised here when the dep exists",
)
def test_tws_matches_apply_in_pandas_with_state(spark, events_src):
    base = _run(spark, events_src, stateful_alerts, "base")
    assert len(base) > 0, "fixture rules must fire on the test data"
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        tws = _run(spark, events_src, stateful_alerts_tws, "rocks")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert sorted(map(_alert_key, base)) == sorted(map(_alert_key, tws))
    # the original_event payload survives the TWS Arrow round-trip too
    b = {_alert_key(r): r["original_event"] for r in base}
    t = {_alert_key(r): r["original_event"] for r in tws}
    k = next(iter(b))
    assert b[k] == t[k]


def test_compile_rules_streaming_backend_param(spark, events_src):
    """The backend switch routes to the TWS stateful branch (gated with
    the actionable protobuf error in this container) and rejects unknown
    names."""
    from stream_sentinel_spark.streaming import (
        compile_rules_streaming,
        read_file_stream,
    )

    path, ev = events_src
    stream = read_file_stream(spark, path, ev.schema, time_col="ts", watermark=None)
    with pytest.raises(ValueError, match="unknown stateful backend"):
        compile_rules_streaming(
            stream, RULES, key_field="user_id", time_col="ts", backend="flink"
        )
    if not _has_protobuf():
        with pytest.raises(RuntimeError, match="protobuf"):
            compile_rules_streaming(
                stream, RULES, key_field="user_id", time_col="ts",
                order_cols=("event_id",), backend="tws",
            )


def test_aiws_on_rocksdb_matches_default_store(spark, events_src):
    """The bench's measured streaming path in this container: the
    applyInPandasWithState backend on the RocksDB state store provider
    must produce the identical alert set to the default in-memory
    store."""
    base = _run(spark, events_src, stateful_alerts, "mem")
    assert len(base) > 0
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    try:
        rocks = _run(spark, events_src, stateful_alerts, "aiws_rocks")
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    assert sorted(map(_alert_key, base)) == sorted(map(_alert_key, rocks))
