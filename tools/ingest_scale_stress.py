"""End-to-end stress of the streaming dedup ingest LOOP (round 6):
run_dedup_ingest driven over many epochs at stress scale, measuring
per-epoch wall clock while the index grows — the composed-production
proof on top of the API-level growth stress
(tools/index_append_stress.py).

Protocol: build the MinHash index on a 5 k-doc base slice of the 40 k
skewed stress corpus, then stream 6 epochs × 5 k docs through
foreachBatch (match → accept → append, compact_every=3) with
maxFilesPerTrigger=1 so each file is one epoch. Record:

- per-epoch wall from the StreamingQuery progress (batch durationMs);
- accepted/duplicate counts per epoch (non-vacuous: the skewed corpus
  plants near-dups across slices);
- index rows + file counts after the run (compaction ran twice);
- a final probe match against a never-streamed slice, compared
  bit-for-bit to the same probe against a from-scratch rebuild over
  base + all accepted rows — the loop's result is EXACTLY the batch
  loop's.

Flatness: per-epoch wall must not scale with index size — assert the
max epoch (excluding the first, which carries streaming-source and
state-store init) is < 2.5× the min.

Run:  python tools/ingest_scale_stress.py [--out STRESS_r06_ingest.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_EPOCHS = 6


def run(out_path: str) -> dict:
    from pyspark.sql import SparkSession

    from stream_sentinel_spark.operators.dedup import (
        build_minhash_index,
        match_minhash_index,
    )
    from stream_sentinel_spark.streaming.ingest import run_dedup_ingest
    from stream_sentinel_spark.streaming.sources import read_file_stream
    from stream_sentinel_spark.testing import make_skewed_corpus

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_ing_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rec: dict = {"n_epochs": N_EPOCHS}
    root = tempfile.mkdtemp(prefix="ss_ing_stress_")

    c = make_skewed_corpus(spark, n_docs=40_000)
    docs = c.docs.localCheckpoint(eager=True)
    m = F.col("doc_id") % 8
    base = docs.filter(m < 1)            # 5k base
    probe = docs.filter(m == 7)          # 5k never-streamed probe

    t0 = time.time()
    build_minhash_index(base, "ing_sx", num_hashes=32, bands=8)
    rec["build_sec"] = round(time.time() - t0, 2)

    # one file per epoch, written in epoch order
    src = f"{root}/src"
    for e in range(N_EPOCHS):
        docs.filter(m == (1 + e)).coalesce(1).write.mode("append").parquet(src)

    stream = read_file_stream(
        spark, src, docs.schema, time_col=None, watermark=None,
        max_files_per_trigger=1,
    )
    t0 = time.time()
    q = run_dedup_ingest(
        stream,
        checkpoint_location=f"{root}/ckpt",
        available_now=True,
        table="ing_sx",
        kind="minhash",
        id_col="doc_id",
        content_col="text",
        threshold=0.8,
        accepted_path=f"{root}/accepted",
        matches_path=f"{root}/matches",
        compact_every=3,
    )
    q.awaitTermination()
    rec["stream_wall_sec"] = round(time.time() - t0, 2)
    rec["epoch_duration_ms"] = [
        p["durationMs"].get("triggerExecution")
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p["numInputRows"] > 0
    ]

    accepted = spark.read.parquet(f"{root}/accepted")
    matches = spark.read.parquet(f"{root}/matches")
    rec["accepted_per_epoch"] = [
        r.n for r in accepted.groupBy("epoch").count()
        .select(F.col("epoch"), F.col("count").alias("n"))
        .orderBy("epoch").collect()
    ]
    rec["duplicates_per_epoch"] = [
        r.n for r in matches.groupBy("epoch").count()
        .select(F.col("epoch"), F.col("count").alias("n"))
        .orderBy("epoch").collect()
    ]
    rec["index_rows"] = spark.table("ing_sx_verify").count()
    rec["index_files"] = len(spark.table("ing_sx_bands").inputFiles())

    # the loop's final index answers a probe EXACTLY like a batch
    # rebuild over base + everything the loop accepted
    cols = ("new_id", "n_matches", "best_jaccard", "first_match")

    def rows(df):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    got = rows(match_minhash_index(spark, probe, "ing_sx", threshold=0.8))
    build_minhash_index(
        base.unionByName(accepted.drop("epoch")).localCheckpoint(eager=True),
        "ing_sx_rebuilt", num_hashes=32, bands=8,
    )
    want = rows(match_minhash_index(spark, probe, "ing_sx_rebuilt", threshold=0.8))
    rec["probe_rows"] = len(got)
    rec["loop_equals_rebuild"] = got == want

    durs = rec["epoch_duration_ms"]
    rec["epoch_flatness_max_over_min_excl_first"] = round(
        max(durs[1:]) / max(min(durs[1:]), 1), 2
    )
    assert rec["loop_equals_rebuild"], "ingest loop drifted from batch rebuild"
    assert rec["probe_rows"] > 0 and sum(rec["duplicates_per_epoch"]) > 0
    assert rec["epoch_flatness_max_over_min_excl_first"] < 2.5
    rec["all_assertions_pass"] = True
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r06_ingest.json")
    args = ap.parse_args()
    run(args.out)
