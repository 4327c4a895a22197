"""Restart-replay proof for exactly-once alert delivery — closes the
documented delta vs the reference's EXACTLY_ONCE Kafka sink
(flink-job/.../StreamSentinelJob.java:154-165, SURVEY §7.4.6).

The publisher test double records every produce attempt to its own file
and can crash once *after* producing but *before* the epoch marker —
the exact window where Spark's built-in sink is merely at-least-once.
The assertions check the delivery contract, not the raw produce count:
replays write byte-identical idempotent keys, so keyed dedup (what a
log-compacted topic does) yields exactly the clean-run alert set, and a
replay of a fully-committed epoch produces nothing at all.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql.functions import col
from pyspark.sql.utils import StreamingQueryException

from stream_sentinel_spark.functions.alerts import serialize_alerts
from stream_sentinel_spark.plans.pipeline import compile_rule
from stream_sentinel_spark.rules import DetectionRule
from stream_sentinel_spark.sources.batch import load_table
from stream_sentinel_spark.streaming import compile_rules_streaming, read_file_stream
from stream_sentinel_spark.streaming.exactly_once import (
    make_exactly_once_batch_fn,
    stamp_alert_uids,
    write_alerts_exactly_once,
)

RULE = DetectionRule(name="high_value", type="threshold", field="value", threshold=250.0)


class RecordingPublisher:
    """Driver-side publisher double: one file per (epoch, attempt) of
    tab-separated ``key\\tvalue`` lines; optionally crashes once after
    the produce has fully landed (the at-least-once gap window)."""

    def __init__(self, out_dir: str, crash_flag: str | None = None) -> None:
        self.out_dir = out_dir
        self.crash_flag = crash_flag
        os.makedirs(out_dir, exist_ok=True)

    def attempts(self, epoch_id: int) -> list[str]:
        return sorted(glob.glob(os.path.join(self.out_dir, f"epoch{epoch_id}-*.tsv")))

    def rows(self, epoch_id: int | None = None) -> list[tuple[str, str]]:
        pattern = "epoch*-*.tsv" if epoch_id is None else f"epoch{epoch_id}-*.tsv"
        out: list[tuple[str, str]] = []
        for path in sorted(glob.glob(os.path.join(self.out_dir, pattern))):
            with open(path) as fh:
                for line in fh:
                    k, v = line.rstrip("\n").split("\t", 1)
                    out.append((k, v))
        return out

    def __call__(self, keyed, epoch_id: int) -> None:
        rows = keyed.collect()  # test double: driver pull is fine here
        attempt = len(self.attempts(epoch_id))
        path = os.path.join(self.out_dir, f"epoch{epoch_id}-{attempt}.tsv")
        with open(path, "w") as fh:
            for r in rows:
                fh.write(f"{r['key']}\t{r['value']}\n")
        if self.crash_flag and os.path.exists(self.crash_flag):
            os.remove(self.crash_flag)
            raise RuntimeError("injected crash: produced, epoch not yet committed")


def _expected_values(spark) -> list[str]:
    """The alert payloads a correct run must deliver exactly once each,
    computed through the batch compiler (proven ≡ streaming by
    test_streaming_parity)."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    alerts = compile_rule(ev, RULE, key_field="user_id", time_col="ts", rule_index=0)
    return sorted(r["value"] for r in serialize_alerts(alerts).collect())


def _start(spark, src, schema, publisher, checkpoint):
    stream = read_file_stream(spark, src, schema, time_col="ts", watermark=None)
    alerts = compile_rules_streaming(stream, [RULE], key_field="user_id", time_col="ts")
    return write_alerts_exactly_once(
        alerts,
        publish=publisher,
        checkpoint_location=checkpoint,
        available_now=True,
    )


def test_crash_replay_delivers_exactly_once(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(src)
    checkpoint = str(tmp_path / "ckpt")
    flag = str(tmp_path / "crash-once")
    open(flag, "w").close()
    pub = RecordingPublisher(str(tmp_path / "wire"), crash_flag=flag)

    # run 1: produce lands, then the job dies before the epoch commit
    q = _start(spark, src, ev.schema, pub, checkpoint)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    assert len(pub.attempts(0)) == 1

    # run 2: same checkpoint — Structured Streaming replays epoch 0
    q = _start(spark, src, ev.schema, pub, checkpoint)
    q.awaitTermination()
    assert len(pub.attempts(0)) == 2

    expected = _expected_values(spark)
    assert expected, "fixture must actually fire alerts"

    raw = pub.rows()
    # the wire saw duplicates (this IS the at-least-once gap) ...
    assert len(raw) == 2 * len(expected)
    # ... but replay produced byte-identical keys, so keyed dedup —
    # the compacted-topic contract — delivers each alert exactly once
    delivered = {k: v for k, v in raw}
    assert sorted(delivered.values()) == expected
    first, second = pub.rows(0)[: len(expected)], pub.rows(0)[len(expected):]
    assert sorted(first) == sorted(second)

    # run 3: epoch committed — restart produces nothing at all
    q = _start(spark, src, ev.schema, pub, checkpoint)
    q.awaitTermination()
    assert len(pub.rows()) == 2 * len(expected)


def test_committed_epoch_replay_is_skipped(spark, tmp_path):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    alerts = compile_rule(ev, RULE, key_field="user_id", time_col="ts", rule_index=0)
    pub = RecordingPublisher(str(tmp_path / "wire"))
    run = make_exactly_once_batch_fn(pub, str(tmp_path / "commits"))

    run(alerts, 7)
    produced = pub.rows(7)
    assert produced
    run(alerts, 7)  # deterministic replay of a committed epoch: no-op
    assert pub.rows(7) == produced


def test_uid_keys_are_deterministic_and_duplicate_safe(spark):
    payloads = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "value string"
    )
    k1 = {(r["key"], r["value"]) for r in stamp_alert_uids(payloads, 3).collect()}
    k2 = {(r["key"], r["value"]) for r in stamp_alert_uids(payloads, 3).collect()}
    assert k1 == k2, "replay must stamp identical keys"
    assert len(k1) == 3, "duplicate payloads in one batch keep distinct keys"
    k_other = {r["key"] for r in stamp_alert_uids(payloads, 4).collect()}
    assert not ({k for k, _ in k1} & k_other), "epochs never collide"


def test_filter_is_still_jvm_side(spark):
    """The exactly-once wrapper must not push rule evaluation into
    Python: the threshold branch stays a codegen'd filter."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    alerts = compile_rule(ev, RULE, key_field="user_id", time_col="ts", rule_index=0)
    plan = stamp_alert_uids(serialize_alerts(alerts), 0)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_marker_pruning_bounds_the_commit_log(spark, tmp_path):
    """The commit log must not grow forever: committing an epoch prunes
    markers older than the retention window, and pruned epochs read as
    uncommitted (safe — the engine can never replay that far back)."""
    from stream_sentinel_spark.streaming import exactly_once as eo

    log_dir = str(tmp_path / "commits")
    for epoch in (1, 2, 3):
        eo.commit_epoch(spark, log_dir, epoch)
    assert all(eo.is_epoch_committed(spark, log_dir, e) for e in (1, 2, 3))

    removed = eo.prune_markers(spark, log_dir, 3)
    assert removed == 2
    assert not eo.is_epoch_committed(spark, log_dir, 1)
    assert eo.is_epoch_committed(spark, log_dir, 3)

    # the periodic hook: a commit at a prune boundary, far enough ahead
    # that the retention window has passed epoch 3, trims the tail
    boundary = ((eo._MARKER_RETENTION // eo._PRUNE_EVERY) + 2) * eo._PRUNE_EVERY
    eo.commit_epoch(spark, log_dir, boundary)
    assert not eo.is_epoch_committed(spark, log_dir, 3)
    assert eo.is_epoch_committed(spark, log_dir, boundary)


def test_multi_epoch_crash_with_stateful_branch(spark, tmp_path):
    """The harder shape: several micro-batches (maxFilesPerTrigger=1), a
    STATEFUL rule in the pipeline (keyed state must replay consistently
    with the alert stream), and a crash at a MIDDLE epoch. After
    restart, keyed dedup over the whole wire equals a clean run's
    alerts: earlier committed epochs are never re-produced, the crashed
    epoch re-produces identical keys, later epochs produce once."""
    from pyspark.sql import functions as F

    from stream_sentinel_spark.streaming import compile_rules_streaming

    rules = [
        RULE,
        DetectionRule(
            name="high_rate", type="rate", key_field="user_id",
            window_seconds=86_400, threshold=4,
        ),
    ]

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "ev")
    # deterministic 3-file split -> 3 micro-batches
    ev.withColumn("_b", F.pmod(F.xxhash64("event_id"), F.lit(3))).write.partitionBy(
        "_b"
    ).parquet(src)

    def start(publisher, checkpoint):
        stream = read_file_stream(
            spark, src, ev.schema, time_col="ts", watermark=None,
            max_files_per_trigger=1,
        )
        alerts = compile_rules_streaming(
            stream, rules, key_field="user_id", time_col="ts",
            order_cols=("event_id",),
        )
        return write_alerts_exactly_once(
            alerts, publish=publisher,
            checkpoint_location=checkpoint, available_now=True,
        )

    # clean reference run
    clean = RecordingPublisher(str(tmp_path / "wire_clean"))
    q = start(clean, str(tmp_path / "ckpt_clean"))
    q.awaitTermination()
    clean_values = sorted(v for _, v in clean.rows())
    n_epochs = len({p.split("/")[-1].split("-")[0] for p in
                    glob.glob(f"{tmp_path}/wire_clean/*.tsv")})
    assert n_epochs >= 2, "fixture must produce multiple micro-batches"

    # crash run: epoch 0 commits cleanly, the crash lands on epoch 1 —
    # after its produce, before its marker
    class CrashSecondEpoch(RecordingPublisher):
        def __call__(self, keyed, epoch_id):
            super().__call__(keyed, epoch_id)
            if epoch_id == 1 and not os.path.exists(
                os.path.join(self.out_dir, "crashed")
            ):
                open(os.path.join(self.out_dir, "crashed"), "w").close()
                raise RuntimeError("injected crash at epoch 1")

    pub2 = CrashSecondEpoch(str(tmp_path / "wire2"))
    ckpt2 = str(tmp_path / "ckpt2")
    q = start(pub2, ckpt2)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination()
    epoch0_attempts = len(pub2.attempts(0))
    assert epoch0_attempts == 1

    q = start(pub2, ckpt2)
    q.awaitTermination()
    # epoch 0 was committed before the crash: never re-produced
    assert len(pub2.attempts(0)) == 1
    # epoch 1 was replayed: two attempts, identical key+value sets.
    # Guard against a vacuously-empty epoch — the replay-determinism
    # property needs actual alerts to compare.
    a1 = pub2.rows(1)
    assert a1, "fixture must fire alerts in the crashed epoch"
    n1 = len(a1) // 2
    assert len(a1) == 2 * n1
    assert sorted(a1[:n1]) == sorted(a1[n1:])
    # delivery contract: keyed dedup over the whole wire == clean run
    delivered = {k: v for k, v in pub2.rows()}
    assert sorted(delivered.values()) == clean_values
