"""Scale stress for the streaming upsert loop (streaming/upsert.py,
x97): the merge-on-read growth story, measured the way the index-append
stress (STRESS_r06_append.json) measured the dedup index.

Shape: a 1 M-row initial insert epoch over 1 M keys, then 8 update
epochs of 125 k changes each (hot keys — every epoch updates the SAME
12.5% of the key space — plus a delete/re-insert stripe), driven
through the real ``make_upsert_batch_fn`` with a commit log. After
each epoch the CURRENT SNAPSHOT is read (the latest-wins window over
the bucketed log) and timed; the log's file count and row count are
recorded alongside. The expected curve: per-epoch append cost flat
(O(batch) bucket-aligned files), snapshot-read cost drifting up with
accumulated LOG ROWS + FILES — that drift is the read amplification
merge-on-read trades for cheap writes, and ``compact_upsert_log`` is
the reset lever (measured before/after, snapshot bit-equality
asserted).

Correctness at every step: the snapshot after each epoch is compared
EXACTLY (exceptAll both ways) against ``cdc.merge_latest`` over the
full change history so far — the batch twin.

Run:  python tools/upsert_scale_stress.py [--out STRESS_r07_upsert.json]
(~5-10 min; idle host.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from pyspark.sql import functions as F


def _load():
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        return None


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_up_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


N_KEYS = 1_000_000
EPOCHS = 8
TABLE = "upstress"


def _epoch_changes(spark, ep: int):
    """Epoch 0: insert every key (seq 0). Epochs 1..N: update the hot
    stripe (k % 8 == 1 → 125 k keys, every epoch — the worst case for
    merge-on-read: maximal superseded-version pileup per key), delete
    the k % 8 == 2, ep-rotating substripe, re-insert last epoch's
    deletions. All deterministic in (k, ep)."""
    if ep == 0:
        return spark.range(N_KEYS).select(
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("seq"),
            F.lit("U").alias("op"),
            (F.col("id") % 1000).cast("double").alias("val"),
        )
    base = spark.range(N_KEYS)
    hot = base.filter(F.col("id") % 8 == 1).select(
        F.col("id").alias("k"),
        F.lit(ep).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        (F.col("id") % 1000 + ep).cast("double").alias("val"),
    )
    dels = base.filter(
        (F.col("id") % 8 == 2) & (F.col("id") % EPOCHS == ep % EPOCHS)
    ).select(
        F.col("id").alias("k"),
        F.lit(ep).cast("long").alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("val"),
    )
    reins = base.filter(
        (F.col("id") % 8 == 2) & (F.col("id") % EPOCHS == (ep - 1) % EPOCHS)
    ).select(
        F.col("id").alias("k"),
        F.lit(ep).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        F.lit(float(ep)).alias("val"),
    )
    return hot.unionByName(dels).unionByName(reins)


def run(out_path: str) -> dict:
    from stream_sentinel_spark.operators.cdc import merge_latest
    from stream_sentinel_spark.streaming.upsert import (
        compact_upsert_log,
        make_upsert_batch_fn,
        read_upsert_snapshot,
    )

    spark = _session()
    root = tempfile.mkdtemp(prefix="ss_upstress_")
    rec: dict = {"n_keys": N_KEYS, "epochs": EPOCHS, "loadavg": _load(),
                 "per_epoch": []}

    fn = make_upsert_batch_fn(
        table=TABLE, key_cols=["k"], seq_cols=["seq"], op_col="op",
        num_buckets=32, commit_log_dir=f"{root}/commits",
    )
    history = None
    for ep in range(EPOCHS + 1):
        ch = _epoch_changes(spark, ep).localCheckpoint(eager=True)
        history = ch if history is None else history.unionByName(ch)
        t0 = time.time()
        fn(ch, ep)
        t_append = time.time() - t0
        t0 = time.time()
        snap = read_upsert_snapshot(
            spark, TABLE, ["k"], ["seq"], op_col="op"
        ).localCheckpoint(eager=True)
        n_live = snap.count()
        t_read = time.time() - t0
        log_tbl = spark.table(f"{TABLE}_log")
        entry = {
            "epoch": ep,
            "changes": ch.count(),
            "append_sec": round(t_append, 2),
            "snapshot_sec": round(t_read, 2),
            "live_keys": n_live,
            "log_rows": log_tbl.count(),
            "log_files": len(log_tbl.inputFiles()),
        }
        # exact batch-twin equality per epoch
        twin = merge_latest(history, ["k"], ["seq"], op_col="op")
        got = snap.select("k", "seq", "op", "val")
        want = twin.select("k", "seq", "op", "val")
        entry["snapshot_equals_batch_twin"] = (
            got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0
        )
        rec["per_epoch"].append(entry)
        print(f"epoch {ep}: append {entry['append_sec']}s, snapshot "
              f"{entry['snapshot_sec']}s over {entry['log_rows']} log rows "
              f"/ {entry['log_files']} files, live {n_live}, twin "
              f"{entry['snapshot_equals_batch_twin']}", flush=True)

    # the reset lever
    before = read_upsert_snapshot(
        spark, TABLE, ["k"], ["seq"], op_col="op"
    ).localCheckpoint(eager=True)
    t0 = time.time()
    rec["compact_files"] = compact_upsert_log(
        spark, TABLE, ["k"], ["seq"], op_col="op"
    )
    rec["compact_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    after = read_upsert_snapshot(
        spark, TABLE, ["k"], ["seq"], op_col="op"
    ).localCheckpoint(eager=True)
    after.count()
    rec["snapshot_sec_after_compact"] = round(time.time() - t0, 2)
    rec["log_rows_after_compact"] = spark.table(f"{TABLE}_log").count()
    rec["compact_preserves_snapshot"] = (
        before.exceptAll(after).count() == 0
        and after.exceptAll(before).count() == 0
    )
    print(f"compaction: {rec['compact_sec']}s -> {rec['compact_files']} "
          f"files / {rec['log_rows_after_compact']} rows, snapshot read "
          f"{rec['per_epoch'][-1]['snapshot_sec']}s -> "
          f"{rec['snapshot_sec_after_compact']}s, preserved "
          f"{rec['compact_preserves_snapshot']}", flush=True)

    rec["all_assertions_pass"] = False
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    assert all(e["snapshot_equals_batch_twin"] for e in rec["per_epoch"])
    assert rec["compact_preserves_snapshot"]
    # append cost must stay O(batch): the 8 update epochs write the same
    # ~140 k-row batches, so their append walls must not trend with the
    # accumulated log (compare last to the cross-epoch minimum)
    appends = [e["append_sec"] for e in rec["per_epoch"][1:]]
    assert max(appends) / max(min(appends), 0.01) < 3.0, appends
    # the log never loses committed rows; compaction resets rows to live
    assert rec["log_rows_after_compact"] == rec["per_epoch"][-1]["live_keys"]
    rec["all_assertions_pass"] = True
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r07_upsert.json")
    args = ap.parse_args()
    run(args.out)
