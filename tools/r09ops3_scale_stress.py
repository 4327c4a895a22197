"""Scale-stress the round-9 second-continuation ops one notch above
the gate fixtures: bloom-filter file skipping and BM25 ranked
retrieval. Writes one JSON record (STRESS_r09_ops3).

Sections (one Spark session; walls + 1-min loadavg + bench-style
calibration bracketing the run):

- **Bloom skipping at 20 M rows / 64 files**: a layout range-clustered
  on `id` (the time axis) carries a high-cardinality `key` column
  scattered by a Weyl permutation — the axis the layout does NOT
  serve. `file_bloom_maps` indexes it in one pass; a 20-key point
  lookup reads through `read_pruned_bloom`. Asserts: zone maps on the
  same column keep ≥ half the files for a single-key probe (the
  min/max interval spans the domain) while the bloom read opens ≤ 6 of
  64; pruned result ≡ plain filter (exceptAll both ways); refresh
  after a 100 k append stats EXACTLY the new files and the refreshed
  index's probe still matches the grown set.
- **BM25 at 5 k and 80 k documents**: the sf0.1 corpus and a ×16
  replica (distinct doc_ids, same texts). Asserts: top-20 is exactly
  k rows, scores non-increasing, every replica group of a base top
  doc scores identically within the ×16 run (rank stability of the
  saturating tf under corpus growth is NOT asserted — idf shifts with
  N — but determinism of equal documents is). Walls recorded for
  both sizes next to the corpus-side token filter's input volume.

Run:  python tools/r09ops3_scale_stress.py [--out STRESS_r09_ops3.json]
(~4-6 min; run on an otherwise idle host.)
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
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_r09c_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


N_ROWS, N_FILES, WEYL = 20_000_000, 64, 2654435761
SCHEMA = "id long, key long, v double"


def _bloom_section(spark, rec, tmp):
    from stream_sentinel_spark.sources.skipping import (
        file_bloom_maps,
        file_zone_maps,
        prune_files,
        prune_files_bloom,
        read_pruned_bloom,
        refresh_bloom_maps,
    )

    path = f"{tmp}/clustered_by_id"
    t0 = time.perf_counter()
    df = spark.range(N_ROWS).select(
        F.col("id"),
        ((F.col("id") * WEYL) % N_ROWS).alias("key"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    df.repartitionByRange(N_FILES, "id").write.parquet(path)
    rec["bloom_layout_write_20m_sec"] = round(time.perf_counter() - t0, 2)

    full = spark.read.schema(SCHEMA).parquet(path)
    # persist the index as parquet and read it back — the deployment
    # shape (the index lives next to the data and outlives the
    # session); a localCheckpoint stores row-oriented InternalRows, so
    # every probe would re-deserialize all 150 MB of map data instead
    # of a columnar scan
    ipath = f"{tmp}/bloom_idx"
    t0 = time.perf_counter()
    file_bloom_maps(full, "key").write.parquet(ipath)
    rec["bloom_index_build_persist_sec"] = round(time.perf_counter() - t0, 2)
    bm = spark.read.parquet(ipath)
    rec["bloom_index_files"] = bm.count()
    assert rec["bloom_index_files"] == len(full.inputFiles())

    # zone maps on the SAME column: the scattered key's [min, max]
    # spans nearly the whole domain in every file
    probe_ids = [7, 123_456, 9_876_543, 19_999_999] + list(
        range(1000, 1016)
    )
    probe_keys = [(i * WEYL) % N_ROWS for i in probe_ids]
    zm = file_zone_maps(full, ["key"])
    rec["bloom_zm_survivors_one_key"] = prune_files(
        zm, {"key": (probe_keys[0], probe_keys[0])}
    ).count()
    assert rec["bloom_zm_survivors_one_key"] >= N_FILES // 2

    t0 = time.perf_counter()
    got = read_pruned_bloom(spark, bm, "key", probe_keys, SCHEMA)
    got_rows = got.localCheckpoint(eager=True)
    rec["bloom_pruned_read_sec"] = round(time.perf_counter() - t0, 2)
    rec["bloom_files_opened"] = len(got.inputFiles())
    # 20 distinct keys live in ≤ 20 files; at fp ≈ 0.13% the expected
    # false-positive surplus is ~2 files — anything near 64 means the
    # filter saturated (the fixed-width failure this sizing exists for)
    assert rec["bloom_files_opened"] <= 30, rec["bloom_files_opened"]

    # repeat probe on the warm session: the steady-state planner cost
    # (first probe pays codegen + broadcast build)
    t0 = time.perf_counter()
    prune_files_bloom(bm, "key", probe_keys).select("_file").collect()
    rec["bloom_prune_repeat_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    want = full.filter(F.col("key").isin(probe_keys)).localCheckpoint(eager=True)
    rec["bloom_full_filter_sec"] = round(time.perf_counter() - t0, 2)
    assert got_rows.exceptAll(want).count() == 0
    assert want.exceptAll(got_rows).count() == 0
    rec["bloom_probe_rows"] = got_rows.count()
    assert rec["bloom_probe_rows"] == len(probe_ids)

    # refresh after an append: stats exactly the new files
    more = spark.range(N_ROWS, N_ROWS + 100_000).select(
        F.col("id"),
        ((F.col("id") * WEYL) % N_ROWS).alias("key"),
        F.lit(0.0).alias("v"),
    )
    more.repartition(2).write.mode("append").parquet(path)
    grown = spark.read.schema(SCHEMA).parquet(path)
    t0 = time.perf_counter()
    bm2 = refresh_bloom_maps(bm, grown, "key").localCheckpoint(eager=True)
    rec["bloom_refresh_sec"] = round(time.perf_counter() - t0, 2)
    rec["bloom_refresh_new_files"] = bm2.count() - rec["bloom_index_files"]
    assert rec["bloom_refresh_new_files"] == 2
    got2 = read_pruned_bloom(spark, bm2, "key", probe_keys, SCHEMA)
    want2 = grown.filter(F.col("key").isin(probe_keys))
    assert got2.exceptAll(want2).count() == 0
    assert want2.exceptAll(got2).count() == 0


def _bm25_section(spark, rec):
    from stream_sentinel_spark.operators.indexing import bm25_topk
    from stream_sentinel_spark.sources.batch import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    rec["bm25_sf01_docs"] = docs.count()
    terms = ["dup", "join", "spark"]
    t0 = time.perf_counter()
    base = bm25_topk(docs, terms, "doc_id", "text", k=20).collect()
    rec["bm25_sf01_sec"] = round(time.perf_counter() - t0, 2)
    assert len(base) == 20
    scores = [r["score"] for r in base]
    assert scores == sorted(scores, reverse=True)

    reps = spark.range(16).select(F.col("id").alias("rep"))
    big = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"), "text"
    ).localCheckpoint(eager=True)
    rec["bm25_x16_docs"] = big.count()
    t0 = time.perf_counter()
    top_big = bm25_topk(big, terms, "doc_id", "text", k=64).collect()
    rec["bm25_x16_sec"] = round(time.perf_counter() - t0, 2)
    assert len(top_big) == 64
    # equal documents must score identically: group replicas by base id
    by_base: dict[int, set] = {}
    for r in top_big:
        by_base.setdefault(r["doc_id"] // 16, set()).add(
            (r["n_terms"], r["score"])
        )
    full_groups = [b for b, s in by_base.items() if len(s) > 1]
    assert not full_groups, f"replicas diverged for base docs {full_groups}"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(_HERE), "STRESS_r09_ops3.json"))
    args = ap.parse_args()
    rec: dict = {"loadavg": {"start": _load()}}
    spark = _session()
    try:
        rec["calibration_pre_sec"] = _calibration(spark)
        tmp = tempfile.mkdtemp(prefix="ss_r09c_stress_")
        try:
            _bloom_section(spark, rec, tmp)
            rec["loadavg"]["bloom"] = _load()
            _bm25_section(spark, rec)
            rec["loadavg"]["bm25"] = _load()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        rec["calibration_post_sec"] = _calibration(spark)
        rec["loadavg"]["end"] = _load()
    finally:
        spark.stop()
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(rec, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
