"""Scale-stress the round-9 CONTINUATION machinery one notch above the
gate fixtures: the durable change-feed consumer, exactly-once aggregate
view maintenance, and zone-map file skipping. Writes one JSON record
(STRESS_r09_ops2).

Sections (one Spark session; per-section wall + 1-min loadavg +
bench-style calibration bracketing the run):

- **Consumer at 1 M keys / 9 epochs**: epoch 0 appends 1 M change rows,
  epochs 1-8 append 100 k each (every 10th a delete) through the real
  batch fn with a commit log; `follow_upsert_changes` drains them in
  2-epoch pages into per-page parquet destinations. Asserts: the page
  plan is exactly [(−1,1],(1,3],(3,5],(5,7],(7,8]], the union of page
  outputs equals the full feed row-for-row (exceptAll both ways), the
  offset lands at 8, and a crashed page (process raises) re-delivers
  the identical rows. Per-page read+sink walls recorded — each page is
  O(page volume), never a log scan.
- **Maintained aggregate view at 1 M keys / 1 000 groups**: the same
  log maintained into a per-group SUM view via `maintain_agg_view`
  (2-epoch pages). Asserts: view ≡ GROUP BY over the current snapshot
  (exceptAll both ways on live groups), _asof_epoch = 8, and the
  incremental maintenance wall is recorded NEXT TO the from-scratch
  recompute wall (the delta path touches O(changed keys), the
  recompute O(log)).
- **Zone maps at 20 M rows / 64 files**: a range-clustered layout is
  indexed in one pass (`file_zone_maps` wall), then a ~1 % range is
  read through the index. Asserts: pruned result count == plain filter
  count, files opened ≤ 3 of 64, `refresh_zone_maps` after a 100 k
  append stats exactly one new file and equals a rebuilt index.

Run:  python tools/r09ops2_scale_stress.py [--out STRESS_r09_ops2.json]
(~6-10 min; run on an otherwise idle host.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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


def _calibration(spark) -> float:
    def once() -> float:
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
        (
            spark.range(4_000_000)
            .selectExpr("id % 100000 AS k", "id AS v")
            .groupBy("k")
            .agg(F.sum("v"))
            .count()
        )
        return time.perf_counter() - t0

    return round(min(once(), once()), 2)


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_r09b_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


N, UPD, EPOCHS = 1_000_000, 100_000, 9


def _epoch_df(spark, e):
    if e == 0:
        return spark.range(N).select(
            F.col("id").alias("k"), F.lit(0).cast("long").alias("seq"),
            F.lit("U").alias("op"), (F.col("id") % 1000).alias("grp"),
            (F.col("id") % 997).cast("long").alias("v"),
        )
    # every 10th row a delete; the rest move the key to a rotated group
    return spark.range(UPD).select(
        ((F.col("id") * 7 + e) % N).alias("k"),
        F.lit(e).cast("long").alias("seq"),
        F.when(F.col("id") % 10 == 0, "D").otherwise("U").alias("op"),
        ((F.col("id") + e) % 1000).alias("grp"),
        ((F.col("id") * 3 + e) % 997).cast("long").alias("v"),
    )


def _build_log(spark, rec, table, commits):
    from stream_sentinel_spark.streaming.upsert import make_upsert_batch_fn

    for t in (f"{table}_log", f"{table}_log__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    fn = make_upsert_batch_fn(
        table=table, key_cols=["k"], seq_cols=["seq"], op_col="op",
        commit_log_dir=commits,
    )
    t0 = time.time()
    for e in range(EPOCHS):
        fn(_epoch_df(spark, e), e)
    rec["log_build_1m_plus_8x100k_sec"] = round(time.time() - t0, 2)


def _consumer(spark, rec, table, commits, out_dir):
    from stream_sentinel_spark.streaming.upsert import (
        follow_upsert_changes,
        read_consumer_offset,
        read_upsert_changes,
    )

    rec["loadavg"]["consumer"] = _load()
    consumer = tempfile.mkdtemp(prefix="ss_r09b_cons_")
    page_walls = []

    def sink(page, since, until):
        t0 = time.time()
        page.write.mode("overwrite").parquet(f"{out_dir}/u{until}")
        page_walls.append(round(time.time() - t0, 2))

    t0 = time.time()
    pages = follow_upsert_changes(
        spark, table, commit_log_dir=commits, consumer_dir=consumer,
        process=sink, max_epochs_per_page=2,
    )
    rec["consumer_drain_sec"] = round(time.time() - t0, 2)
    rec["consumer_pages"] = pages
    rec["consumer_page_sink_walls_sec"] = page_walls
    assert pages == [(-1, 1), (1, 3), (3, 5), (5, 7), (7, 8)], pages
    assert read_consumer_offset(spark, consumer) == 8
    union = spark.read.parquet(f"{out_dir}/u*")
    feed = read_upsert_changes(spark, table, -1, commit_log_dir=commits)
    assert union.exceptAll(feed).count() == 0
    assert feed.exceptAll(union).count() == 0
    rec["consumer_rows_total"] = union.count()
    assert rec["consumer_rows_total"] == N + (EPOCHS - 1) * UPD

    # crash matrix at scale: a dying consumer re-delivers byte-identical
    crash_dir = tempfile.mkdtemp(prefix="ss_r09b_crash_")
    seen = {}

    def dying(page, since, until):
        seen["first"] = page.count()
        raise RuntimeError("die")

    try:
        follow_upsert_changes(
            spark, table, commit_log_dir=commits, consumer_dir=crash_dir,
            process=dying, max_epochs_per_page=2,
        )
        raise AssertionError("consumer crash did not propagate")
    except RuntimeError:
        pass
    assert read_consumer_offset(spark, crash_dir) == -1
    redelivered = {}
    follow_upsert_changes(
        spark, table, commit_log_dir=commits, consumer_dir=crash_dir,
        process=lambda p, s, u: redelivered.setdefault("first", p.count()),
        max_epochs_per_page=2,
    )
    assert redelivered["first"] == seen["first"] == N + UPD
    rec["consumer_crash_redelivery_rows"] = redelivered["first"]
    shutil.rmtree(consumer, ignore_errors=True)
    shutil.rmtree(crash_dir, ignore_errors=True)


def _view(spark, rec, table, commits):
    from stream_sentinel_spark.streaming.upsert import (
        maintain_agg_view,
        read_agg_view,
        read_upsert_snapshot,
    )

    rec["loadavg"]["view"] = _load()
    view = "r09b_view"
    consumer = tempfile.mkdtemp(prefix="ss_r09b_view_")
    for t in (view, f"{view}__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    t0 = time.time()
    pages = maintain_agg_view(
        spark, table, view,
        key_cols=["k"], seq_cols=["seq"], group_col="grp", value_col="v",
        op_col="op", commit_log_dir=commits, consumer_dir=consumer,
        max_epochs_per_page=2,
    )
    rec["view_maintain_5_pages_sec"] = round(time.time() - t0, 2)
    assert len(pages) == 5, pages
    got = read_agg_view(spark, view).filter(F.col("n_keys") > 0).select(
        "grp", "total", "n_keys"
    )
    t0 = time.time()
    want = (
        read_upsert_snapshot(spark, table, ["k"], ["seq"], op_col="op")
        .groupBy("grp")
        .agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    ).localCheckpoint(eager=True)
    rec["view_full_recompute_sec"] = round(time.time() - t0, 2)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    rec["view_groups"] = got.count()
    asof = read_agg_view(spark, view).select(F.max("_asof_epoch")).head()[0]
    assert asof == 8, asof
    shutil.rmtree(consumer, ignore_errors=True)
    for t in (view, f"{view}__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _skipping(spark, rec):
    from stream_sentinel_spark.sources.skipping import (
        file_zone_maps,
        read_pruned,
        refresh_zone_maps,
    )

    rec["loadavg"]["skipping"] = _load()
    n, files = 20_000_000, 64
    sch = "id long, v long, s long"
    path = tempfile.mkdtemp(prefix="ss_r09b_zm_") + "/data"
    df = spark.range(n).select(
        F.col("id"), (F.col("id") * 5).alias("v"),
        (F.col("id") % 33_331).alias("s"),
    )
    t0 = time.time()
    df.repartitionByRange(files, "id").write.parquet(path)
    rec["zm_layout_write_20m_sec"] = round(time.time() - t0, 2)
    full = spark.read.schema(sch).parquet(path)
    t0 = time.time()
    zm = file_zone_maps(full, ["v"]).localCheckpoint(eager=True)
    rec["zm_index_build_sec"] = round(time.time() - t0, 2)
    rec["zm_index_files"] = zm.count()
    lo, hi = 40_000_000, 41_000_000  # ~200k rows, ~1% of the v domain
    t0 = time.time()
    pruned = read_pruned(spark, zm, {"v": (lo, hi)}, sch)
    n_pruned = pruned.count()
    rec["zm_pruned_read_sec"] = round(time.time() - t0, 2)
    rec["zm_files_opened"] = len(pruned.inputFiles())
    t0 = time.time()
    n_full = full.filter((F.col("v") >= lo) & (F.col("v") <= hi)).count()
    rec["zm_full_filter_sec"] = round(time.time() - t0, 2)
    assert n_pruned == n_full == 200_001, (n_pruned, n_full)
    assert rec["zm_files_opened"] <= 3, rec["zm_files_opened"]
    # incremental refresh: one appended file, one new index row
    spark.range(100_000).select(
        (F.col("id") + n).alias("id"),
        (F.lit(10**12) + F.col("id")).alias("v"),
        F.lit(0).cast("long").alias("s"),
    ).coalesce(1).write.mode("append").parquet(path)
    t0 = time.time()
    zm2 = refresh_zone_maps(
        zm, spark.read.schema(sch).parquet(path), ["v"]
    ).localCheckpoint(eager=True)
    rec["zm_refresh_sec"] = round(time.time() - t0, 2)
    assert zm2.count() == rec["zm_index_files"] + 1
    tail = read_pruned(spark, zm2, {"v": (10**12, None)}, sch)
    assert tail.count() == 100_000
    assert len(tail.inputFiles()) == 1
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def run(out_path: str) -> dict:
    spark = _session()
    rec: dict = {"loadavg": {"start": _load()}}
    rec["calibration_pre_sec"] = _calibration(spark)
    table = "r09b_feed"
    commits = tempfile.mkdtemp(prefix="ss_r09b_commits_")
    out_dir = tempfile.mkdtemp(prefix="ss_r09b_pages_")
    try:
        _build_log(spark, rec, table, commits)
        _consumer(spark, rec, table, commits, out_dir)
        _view(spark, rec, table, commits)
        _skipping(spark, rec)
    finally:
        shutil.rmtree(commits, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        for t in (f"{table}_log", f"{table}_log__compacting"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    rec["calibration_post_sec"] = _calibration(spark)
    rec["loadavg"]["end"] = _load()
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1, sort_keys=True)
    print(json.dumps(rec, indent=1, sort_keys=True))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r09_ops2.json")
    args = ap.parse_args()
    run(args.out)
