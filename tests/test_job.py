"""M4/§3.1: full job lifecycle (StreamSentinelJob.main parity) —
config → rules → health → pipeline → sink, driven end-to-end over a
file stream with the reference's sample-events corpus semantics."""

from __future__ import annotations

import json
import socket
import urllib.request

import pytest

from stream_sentinel_spark.config import EngineConfig
from stream_sentinel_spark.job import run_job
from stream_sentinel_spark.sources.batch import load_table
from stream_sentinel_spark.streaming import read_file_stream


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_run_job_lifecycle(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev")
    ev.write.parquet(src)

    rules_yml = tmp_path / "rules.yml"
    rules_yml.write_text(
        "rules:\n"
        "  - name: high_value\n"
        "    type: threshold\n"
        "    field: value\n"
        "    threshold: 250.0\n"
        "  - name: high_rate\n"
        "    type: rate\n"
        "    keyField: user_id\n"
        "    windowSeconds: 86400\n"
        "    threshold: 4\n"
    )

    port = _free_port()
    config = EngineConfig(health_port=port)
    stream = read_file_stream(spark, src, ev.schema, time_col="ts", watermark=None)

    def start_memory(alerts):
        return (
            alerts.writeStream.format("memory")
            .queryName("job_lifecycle")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    q = run_job(
        spark,
        config,
        events=stream,
        start_query=start_memory,
        key_field="user_id",
        time_col="ts",
        rules_path=str(rules_yml),
    )
    q.awaitTermination()

    # alerts flowed
    rows = spark.table("job_lifecycle").collect()
    assert len(rows) > 0
    assert {r["rule_name"] for r in rows} == {"high_value", "high_rate"}
    # health endpoint is live (stage 3)
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
        assert json.loads(r.read()) == {"status": "UP"}


def test_run_job_empty_rules_fatal(spark, tmp_path):
    rules_yml = tmp_path / "empty.yml"
    rules_yml.write_text("rules: []\n")
    with pytest.raises(RuntimeError, match="No detection rules"):
        run_job(spark, EngineConfig(health_port=_free_port()),
                rules_path=str(rules_yml))


def test_kafka_connector_error_is_actionable(spark):
    """Without the kafka connector on the classpath, the source raises a
    deploy hint instead of a bare ClassNotFound."""
    from stream_sentinel_spark.streaming import read_kafka_stream

    with pytest.raises(RuntimeError, match="--packages org.apache.spark:spark-sql-kafka"):
        read_kafka_stream(spark, EngineConfig())
