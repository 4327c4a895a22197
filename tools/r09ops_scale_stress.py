"""Scale-stress the round-9 machinery one notch above the gate
fixtures: the upsert change-feed read, greedy bin-fill sequence
packing, and the auto-sized LSH index build. Writes one JSON record
(STRESS_r09_ops).

Sections (one Spark session; per-section wall + 1-min loadavg +
bench-style calibration bracketing the run):

- **Change feed at 1 M keys / 5 epochs**: epoch 0 appends 1 M change
  rows, epochs 1-4 append 100 k each through the real batch fn with a
  commit log. Asserts: `read_upsert_changes(since_epoch=2)` returns
  EXACTLY epochs 3-4's rows (exceptAll both ways against the planted
  change set), an uncommitted epoch-5 append (files landed, no commit
  marker — the crash window) never surfaces in the feed, and the
  feed's wall is recorded for a 200 k slice vs the full 1.4 M read —
  the slice must not pay for the log it skips (both are one
  manifest-listed scan; the slice prunes on the epoch stamp).
- **Bin-fill packing at 2 M docs**: `pack_sequences` over synthetic
  (doc_id, n_tok) pairs (sizes 1..900, context 1024, 256 shards).
  Asserts: token conservation (sum of packed == sum of capped input),
  no window over capacity, window ids contiguous from 0 per shard, and
  the fill report aggregates to the same totals. Wall + docs/sec
  recorded — the shuffle moves 16 bytes a doc and the fill is one
  linear pandas pass per shard.
- **Auto-sized index build at 200 k clustered vectors**: the
  STRESS_r07_newops shape (10% hot cluster) through
  `_auto_lsh_bits` — asserts the probe walks past the 4-bit default
  (≥8-bit band keys on the clustered corpus, the VERDICT r08 item-5
  criterion) and records per-trial hottest-bucket occupancy and the
  probe wall (one map pass + keyed count per trial, no writes).

Run:  python tools/r09ops_scale_stress.py [--out STRESS_r09_ops.json]
(~10-15 min; run on an otherwise idle host.)
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
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_r09_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _change_feed(spark, rec):
    from stream_sentinel_spark.sources.bucketing import write_bucketed
    from stream_sentinel_spark.streaming.upsert import (
        make_upsert_batch_fn,
        read_upsert_changes,
    )

    rec["loadavg"]["change_feed"] = _load()
    table = "r09_feed"
    commits = tempfile.mkdtemp(prefix="ss_r09_commits_")
    for t in (f"{table}_log", f"{table}_log__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n, upd, epochs = 1_000_000, 100_000, 5

    def ep(e):
        if e == 0:
            return spark.range(n).select(
                F.col("id").alias("k"), F.lit(0).cast("long").alias("seq"),
                F.lit("U").alias("op"),
                F.concat(F.lit("e0:"), F.col("id").cast("string")).alias("val"),
            )
        return spark.range(upd).select(
            ((F.col("id") * 7 + e) % n).alias("k"),
            F.lit(e).cast("long").alias("seq"), F.lit("U").alias("op"),
            F.concat(F.lit(f"e{e}:"), F.col("id").cast("string")).alias("val"),
        )

    fn = make_upsert_batch_fn(
        table=table, key_cols=["k"], seq_cols=["seq"], op_col="op",
        commit_log_dir=commits,
    )
    t0 = time.time()
    for e in range(epochs):
        fn(ep(e), e)
    rec["feed_build_1m_plus_4x100k_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    feed = read_upsert_changes(
        spark, table, 2, commit_log_dir=commits
    ).localCheckpoint(eager=True)
    rec["feed_read_200k_slice_sec"] = round(time.time() - t0, 2)
    rec["feed_rows_since_2"] = feed.count()
    want = ep(3).withColumn("_epoch", F.lit(3)).unionByName(
        ep(4).withColumn("_epoch", F.lit(4))
    )
    got = feed.select("k", "seq", "op", "val", "_epoch")
    rec["feed_equals_planted_changes"] = (
        got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    )
    t0 = time.time()
    rec["feed_rows_full"] = read_upsert_changes(
        spark, table, -1, commit_log_dir=commits
    ).count()
    rec["feed_read_full_1p4m_sec"] = round(time.time() - t0, 2)

    # crash window: epoch-5 files land, no commit marker — the feed
    # must not see them while the catalog-table read does
    write_bucketed(
        ep(5).withColumn("seq", F.lit(5).cast("long"))
        .withColumn("_epoch", F.lit(5)),
        f"{table}_log", ["k"], 32, mode="append", align=True,
    )
    spark.catalog.refreshTable(f"{table}_log")
    rec["feed_rows_after_uncommitted_append"] = read_upsert_changes(
        spark, table, 2, commit_log_dir=commits
    ).count()
    rec["catalog_rows_after_uncommitted_append"] = (
        spark.table(f"{table}_log").filter("_epoch > 2").count()
    )
    for t in (f"{table}_log", f"{table}_log__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    assert rec["feed_equals_planted_changes"]
    assert rec["feed_rows_since_2"] == 2 * upd
    assert rec["feed_rows_after_uncommitted_append"] == 2 * upd
    assert rec["catalog_rows_after_uncommitted_append"] == 3 * upd
    print(
        f"change feed: slice {rec['feed_read_200k_slice_sec']}s "
        f"({rec['feed_rows_since_2']} rows), full "
        f"{rec['feed_read_full_1p4m_sec']}s ({rec['feed_rows_full']} rows), "
        f"crash-excluded", flush=True,
    )


def _packing(spark, rec):
    from stream_sentinel_spark.operators.curation import (
        pack_fill_stats,
        pack_sequences,
    )

    rec["loadavg"]["packing"] = _load()
    n, cap = 2_000_000, 1024
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 13) % 900 + 1).alias("n_tok"),
    )
    t0 = time.time()
    packed = pack_sequences(
        docs, "doc_id", "n_tok", context_len=cap, n_shards=256
    ).localCheckpoint(eager=True)
    rec["pack_2m_docs_sec"] = round(time.time() - t0, 2)
    rec["pack_docs_per_sec"] = int(n / max(rec["pack_2m_docs_sec"], 1e-9))
    tot = packed.agg(
        F.sum("n_tok_packed").alias("s"),
        F.max(F.col("win_offset") + F.col("n_tok_packed")).alias("mx"),
        F.count(F.lit(1)).alias("cnt"),
    ).head()
    want_total = docs.agg(
        F.sum(F.least(F.col("n_tok"), F.lit(cap)))
    ).head()[0]
    rec["pack_tokens_conserved"] = int(tot.s) == int(want_total)
    rec["pack_max_window_use"] = int(tot.mx)
    rec["pack_rows"] = int(tot.cnt)
    contig = (
        packed.groupBy("shard")
        .agg(
            F.max("window_id").alias("mx"),
            F.countDistinct("window_id").alias("nd"),
        )
        .filter(F.col("mx") + 1 != F.col("nd"))
        .count()
    )
    rec["pack_windows_contiguous"] = contig == 0
    stats = pack_fill_stats(packed, cap)
    st = stats.agg(
        F.sum("n_tokens").alias("s"), F.count(F.lit(1)).alias("wins"),
        F.avg("fill_rate").alias("fill"),
    ).head()
    rec["pack_windows"] = int(st.wins)
    rec["pack_mean_fill_rate"] = round(float(st.fill), 4)
    rec["pack_stats_tokens_match"] = int(st.s) == int(tot.s)
    assert rec["pack_tokens_conserved"]
    assert rec["pack_max_window_use"] <= cap
    assert rec["pack_windows_contiguous"]
    assert rec["pack_stats_tokens_match"]
    assert rec["pack_rows"] == n
    print(
        f"packing: {rec['pack_2m_docs_sec']}s for 2M docs "
        f"({rec['pack_docs_per_sec']}/s), {rec['pack_windows']} windows, "
        f"mean fill {rec['pack_mean_fill_rate']}", flush=True,
    )


def _auto_bits(spark, rec):
    from stream_sentinel_spark.operators.similarity import (
        _auto_lsh_bits,
        _band_struct_expr,
        lsh_signatures,
    )
    from stream_sentinel_spark.testing import make_skewed_embeddings

    rec["loadavg"]["auto_bits"] = _load()
    e = make_skewed_embeddings(
        spark, n_vecs=200_000, hot_cluster=20_000, planted_pairs=5_000,
        n_queries=100,
    )
    vecs = e.vectors.localCheckpoint(eager=True)
    per_trial = {}
    for bits in (16, 32, 64):
        t0 = time.time()
        sig = lsh_signatures(vecs, "vec_id", "embedding", bits, 64, 42)
        hottest = (
            sig.select(F.explode(_band_struct_expr(bits, 4)).alias("bb"))
            .groupBy("bb.band", "bb.val")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n"))
            .head()[0]
        )
        per_trial[bits] = {
            "hottest": int(hottest), "sec": round(time.time() - t0, 2)
        }
    rec["auto_trials"] = per_trial
    t0 = time.time()
    chosen = _auto_lsh_bits(vecs, "vec_id", "embedding", 4, 64, 42, 10_000)
    rec["auto_probe_sec"] = round(time.time() - t0, 2)
    rec["auto_chosen_bits"] = int(chosen)
    # the clustered corpus must walk past the 4-bit default (>=8-bit
    # band keys — the VERDICT r08 item-5 acceptance criterion)
    assert chosen >= 32, rec
    print(
        f"auto bits: chose {chosen} in {rec['auto_probe_sec']}s; trials "
        f"{per_trial}", flush=True,
    )


def run(out_path: str) -> dict:
    spark = _session()
    rec: dict = {"loadavg": {"start": _load()}}
    rec["calibration_pre_sec"] = _calibration(spark)
    _change_feed(spark, rec)
    _packing(spark, rec)
    _auto_bits(spark, rec)
    rec["calibration_post_sec"] = _calibration(spark)
    rec["loadavg"]["end"] = _load()
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}", flush=True)
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(_HERE), "STRESS_r09_ops.json"))
    run(ap.parse_args().out)
