"""Scale stress for the round-7 frontier operators (x93-x96) at the
same one-notch-above-evidence shapes as tools/sf1_scale_stress.py:

- x94 (nb_quality_classifier) at 150 k documents — the two hash-agg
  passes and the vocabulary broadcast must stay linear; the weight
  table is model-parameter sized regardless of corpus size.
- x95 (excise_duplicated_spans) at 150 k documents INCLUDING a 3 000-doc
  near-identical hot cluster — the hot-key regime by construction:
  every window of the cluster text occurs ~3 000×, so the
  first-occurrence hash-agg and the duplicated-occurrence join both see
  pathological keys. The partial-agg formulation (no window function,
  no per-hash sort) is what this measures; a super-linear cliff here
  would mean the formulation regressed to sorting the inventory.
- x93 (streaming session windows) at 1 M events / ~100 k keys across
  12 micro-batches — append-mode emission must match the batch
  session_window plan EXACTLY (exceptAll both ways) while the state
  store holds ~one open session per key until the watermark passes it.
- x96 (embedding-index ingest loop) at 75 k vectors — 25 k-vector base
  index + 2 epochs × 25 k through run_dedup_ingest(kind="lsh"),
  per-epoch flatness and loop ≡ batch-rebuild probe equality at this
  scale (the minhash twin is stressed in sf1_scale_stress.py).

Run:  python tools/newops_scale_stress.py [--out STRESS_r07_newops.json]
(~10-20 min; idle host — per-section loadavg recorded.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from functools import reduce

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from pyspark.sql import functions as F

SENTINEL_KEY = -1


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
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_no_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run(out_path: str, sf_dir: str = "/root/testdata/sf0.1") -> dict:
    from stream_sentinel_spark.operators.curation import (
        excise_duplicated_spans,
        nb_quality_classifier,
    )
    from stream_sentinel_spark.operators.similarity import (
        build_lsh_index,
        match_lsh_index,
    )
    from stream_sentinel_spark.operators.windows import session_windows
    from stream_sentinel_spark.sources.batch import load_table
    from stream_sentinel_spark.streaming import read_file_stream
    from stream_sentinel_spark.streaming.ingest import run_dedup_ingest
    from stream_sentinel_spark.testing import (
        make_skewed_corpus,
        make_skewed_embeddings,
    )

    spark = _session()
    rec: dict = {"loadavg": {}}
    root = tempfile.mkdtemp(prefix="ss_newops_")

    c150 = make_skewed_corpus(
        spark, n_docs=150_000, hot_cluster=3_000, planted_pairs=7_500
    )
    c150.docs.localCheckpoint(eager=True)
    n_tokens_in = c150.docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).head()[0]
    rec["n_docs"] = c150.n_docs
    rec["n_tokens"] = n_tokens_in

    # ---- x94 NB classifier at 150k -----------------------------------------
    rec["loadavg"]["x94"] = _load()
    # ttr 1/1 (all-distinct ⇔ high) instead of the corpus entry's 21/50:
    # the synthetic generator draws ~50 tokens from an 8 000-word vocab,
    # so nearly every doc clears 0.42 (degenerate split); at 1.0 the
    # birthday-collision docs (~14%) label low — a non-degenerate split
    # through the identical code path
    t0 = time.time()
    cls = nb_quality_classifier(
        c150.docs, "doc_id", "text", ttr_num=1, ttr_den=1
    ).localCheckpoint(eager=True)
    rec["x94_rows_150k"] = cls.count()
    rec["x94_sec_150k"] = round(time.time() - t0, 2)
    agg = cls.agg(
        F.sum(F.col("label_hi").cast("int")).alias("hi"),
        F.sum(F.col("pred_hi").cast("int")).alias("pred"),
        F.sum(
            (F.col("label_hi") != F.col("pred_hi")).cast("int")
        ).alias("flips"),
    ).head()
    rec["x94_label_hi"] = agg.hi
    rec["x94_pred_hi"] = agg.pred
    rec["x94_disagreements"] = agg.flips
    print(
        f"x94 150k: {rec['x94_rows_150k']} rows in {rec['x94_sec_150k']}s "
        f"(hi {agg.hi}, pred {agg.pred}, flips {agg.flips})",
        flush=True,
    )

    # ---- x95 span excision at 150k (hot-key regime by construction) --------
    rec["loadavg"]["x95"] = _load()
    t0 = time.time()
    ex = excise_duplicated_spans(c150.docs, "doc_id", "text", k=5).localCheckpoint(
        eager=True
    )
    rec["x95_rows_150k"] = ex.count()
    rec["x95_sec_150k"] = round(time.time() - t0, 2)
    stats = ex.agg(
        F.sum("n_kept").alias("kept"),
        F.sum("n_removed").alias("removed"),
        F.sum((F.col("n_kept") == 0).cast("int")).alias("emptied"),
    ).head()
    rec["x95_tokens_kept"] = stats.kept
    rec["x95_tokens_removed"] = stats.removed
    rec["x95_docs_fully_excised"] = stats.emptied
    # hot-regime proof: the max per-window occurrence count (the hot
    # cluster's windows occur ~cluster-size times)
    from stream_sentinel_spark.operators.curation import word_tokens

    d = c150.docs.select("doc_id", word_tokens("text").alias("_toks"))
    n = F.size("_toks")
    win = d.select(
        F.explode(
            F.when(
                n >= 5,
                F.transform(
                    F.sequence(F.lit(1), n - 4),
                    lambda i: F.md5(
                        F.concat_ws("\x1f", F.slice("_toks", i, 5))
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("wh")
    )
    rec["x95_max_window_occurrences"] = (
        win.groupBy("wh").agg(F.count(F.lit(1)).alias("c")).agg(F.max("c")).head()[0]
    )
    print(
        f"x95 150k: {rec['x95_sec_150k']}s, removed {stats.removed}/"
        f"{n_tokens_in} tokens, {stats.emptied} docs emptied, hot window "
        f"×{rec['x95_max_window_occurrences']}",
        flush=True,
    )

    # ---- x93 streaming session windows at 1M events -------------------------
    rec["loadavg"]["x93"] = _load()
    ev = load_table(spark, sf_dir, "events")
    span_ms = ev.agg(
        (F.max(F.unix_millis("ts")) - F.min(F.unix_millis("ts")))
    ).head()[0] + 60_000

    def copy(k: int):
        return ev.select(
            (F.col("event_id") + F.lit(k * 100_000_000)).alias("event_id"),
            F.timestamp_millis(
                F.unix_millis("ts") + F.lit(int(k) * span_ms)
            ).alias("ts"),
            (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
            "event_type", "value", "props",
        ).select(*ev.columns)

    big = reduce(
        lambda a, b: a.unionByName(b), [copy(k) for k in range(10)]
    ).localCheckpoint(eager=True)
    rec["x93_events"] = big.count()
    rec["x93_keys"] = big.select("user_id").distinct().count()

    src = f"{root}/ev_src"
    for k in range(10):
        copy(k).coalesce(1).write.mode("append").parquet(src)
    files = sorted(
        (f for f in os.listdir(src) if f.startswith("part-")),
        key=lambda f: os.stat(f"{src}/{f}").st_mtime,
    )
    base_mt = time.time()
    for i, f in enumerate(files):
        os.utime(f"{src}/{f}", (base_mt, base_mt + 2.0 * i))
    max_ms = big.agg(F.max(F.unix_millis("ts"))).head()[0]
    # gap (1 h) + delay (5 s) + margin; second sentinel carries the
    # first's watermark into effect
    for j, off in enumerate((3_700_000, 3_710_000)):
        before = set(os.listdir(src))
        spark.createDataFrame(
            [(-(j + 1), SENTINEL_KEY, "sentinel")],
            "event_id long, user_id long, event_type string",
        ).select(
            "event_id",
            F.timestamp_millis(F.lit(max_ms + off)).alias("ts"),
            "user_id", "event_type",
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("string").alias("props"),
        ).select(*ev.columns).coalesce(1).write.mode("append").parquet(src)
        for f in set(os.listdir(src)) - before:
            os.utime(f"{src}/{f}",
                     (base_mt, base_mt + 2.0 * (len(files) + j + 1)))

    stream = (
        read_file_stream(
            spark, src, ev.schema, time_col="ts", watermark=None,
            max_files_per_trigger=1,
        )
        .withColumn("ts_ms", F.timestamp_millis(F.unix_millis("ts")))
        .withWatermark("ts_ms", "5 seconds")
    )
    got = session_windows(
        stream,
        F.coalesce(F.col("user_id").cast("string"), F.lit("__unknown__")),
        "ts_ms", "1 hour",
    )
    out = f"{root}/sessions"
    t0 = time.time()
    q = (
        got.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{root}/sess_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    streamed = spark.read.parquet(out).localCheckpoint(eager=True)
    expected = session_windows(
        big.withColumn("ts_ms", F.timestamp_millis(F.unix_millis("ts"))),
        F.coalesce(F.col("user_id").cast("string"), F.lit("__unknown__")),
        "ts_ms", "1 hour",
    ).localCheckpoint(eager=True)
    rec["x93_sec"] = round(wall, 2)
    rec["x93_eps"] = int(rec["x93_events"] / wall)
    rec["x93_sessions"] = streamed.count()
    rec["x93_batch_sessions"] = expected.count()
    rec["x93_parity"] = (
        streamed.exceptAll(expected).count() == 0
        and expected.exceptAll(streamed).count() == 0
    )
    print(
        f"x93: {rec['x93_sessions']} sessions over {rec['x93_events']} "
        f"events in {wall:.1f}s ({rec['x93_eps']} ev/s), parity "
        f"{rec['x93_parity']}",
        flush=True,
    )

    # ---- x96 embedding ingest loop at 100k vectors ---------------------------
    # FIRST RUN FINDING (recorded, then mitigated): at the DEFAULT index
    # params (bits=16, bands=4 → 4-bit band keys, 16 values per band) a
    # clustered corpus collides entire clusters into single band
    # buckets — a 25k-vs-25k match on this fixture produces candidate
    # volume quadratic in the cluster sizes, and each epoch's verify
    # crawled for ~12 min materializing vectors for every candidate.
    # The lever is SIGNATURE WIDTH, not the join: 8-bit band keys
    # (bits=32, bands=4) keep near-identical vectors colliding (that's
    # the point) while background clusters (noise 0.6) stop colliding
    # (measured: 163M -> 20.9M candidates, 66s -> 6.2s). Both candidate
    # counts are measured below; the loop runs at the width a clustered
    # corpus needs.
    rec["loadavg"]["x96"] = _load()
    from stream_sentinel_spark.operators.similarity import index_candidates

    e = make_skewed_embeddings(
        spark, n_vecs=100_000, hot_cluster=10_000, planted_pairs=1_000,
        n_queries=100, dim=64,
    )
    vecs = e.vectors.localCheckpoint(eager=True)
    m = F.col("vec_id") % 4
    base = vecs.filter(m == 0)
    probe = vecs.filter(m == 3)
    for tag, bits in (("default_b16", 16), ("wide_b32", 32)):
        t0 = time.time()
        build_lsh_index(base, f"no_cand_{tag}", bits=bits)
        t_build = time.time() - t0
        t0 = time.time()
        n_cand = index_candidates(
            spark, vecs.filter(m == 1), f"no_cand_{tag}", "vec_id",
            "embedding",
        ).count()
        rec[f"x96_candidates_{tag}"] = n_cand
        rec[f"x96_candidates_{tag}_sec"] = round(time.time() - t0, 2)
        rec[f"x96_build_{tag}_sec"] = round(t_build, 2)
        print(f"x96 candidates {tag}: {n_cand} in "
              f"{rec[f'x96_candidates_{tag}_sec']}s", flush=True)
    rec["x96_candidate_ratio"] = round(
        rec["x96_candidates_default_b16"] / max(rec["x96_candidates_wide_b32"], 1), 1
    )
    t0 = time.time()
    build_lsh_index(base, "no_lsh_ing", bits=32)
    rec["x96_build_sec"] = round(time.time() - t0, 2)
    src = f"{root}/lsh_src"
    for ep in (1, 2):
        vecs.filter(m == ep).coalesce(1).write.mode("append").parquet(src)
    stream = read_file_stream(
        spark, src, vecs.schema, time_col=None, watermark=None,
        max_files_per_trigger=1,
    )
    t0 = time.time()
    q = run_dedup_ingest(
        stream, checkpoint_location=f"{root}/lsh_ckpt", available_now=True,
        table="no_lsh_ing", kind="lsh", id_col="vec_id",
        content_col="embedding", threshold=0.9,
        accepted_path=f"{root}/lsh_acc", commit_log_dir=f"{root}/lsh_commits",
    )
    q.awaitTermination()
    rec["x96_stream_sec"] = round(time.time() - t0, 2)
    durs = [
        p["durationMs"].get("triggerExecution")
        for p in (json.loads(x.json) for x in q.recentProgress)
        if p["numInputRows"] > 0
    ]
    rec["x96_epoch_ms"] = durs
    rec["x96_flatness_excl_first"] = (
        round(max(durs[1:]) / max(min(durs[1:]), 1), 2) if len(durs) > 2
        else 1.0
    )
    accepted = spark.read.parquet(f"{root}/lsh_acc")
    rec["x96_accepted"] = accepted.count()
    cols = ("new_id", "n_matches", "best_cos", "first_match")
    rows = lambda df: sorted(  # noqa: E731
        tuple(r[c] for c in cols) for r in df.collect()
    )
    got_m = rows(match_lsh_index(spark, probe, "no_lsh_ing", threshold=0.9))
    build_lsh_index(
        base.unionByName(accepted.drop("epoch")).localCheckpoint(eager=True),
        "no_lsh_rb", bits=32,
    )
    want_m = rows(match_lsh_index(spark, probe, "no_lsh_rb", threshold=0.9))
    rec["x96_probe_rows"] = len(got_m)
    rec["x96_loop_equals_rebuild"] = got_m == want_m
    print(
        f"x96: epochs {durs}, accepted {rec['x96_accepted']}, "
        f"loop==rebuild {rec['x96_loop_equals_rebuild']}",
        flush=True,
    )

    # ---- assertions (artifact written first — sf1 harness discipline) ------
    rec["all_assertions_pass"] = False
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    assert rec["x94_rows_150k"] == c150.n_docs
    assert 0 < rec["x94_label_hi"] < c150.n_docs, "degenerate label split"
    assert rec["x95_rows_150k"] == c150.n_docs
    assert rec["x95_tokens_kept"] + rec["x95_tokens_removed"] == n_tokens_in
    assert rec["x95_max_window_occurrences"] > 256, "hot regime not engaged"
    # the hot cluster (2% of docs, near-identical) must be substantially
    # excised; exact-copy docs (swap collisions) are recorded, not
    # asserted — the generator's swaps make them possible, not certain
    assert rec["x95_tokens_removed"] > 0.01 * n_tokens_in
    assert rec["x93_parity"]
    assert rec["x93_sessions"] == rec["x93_batch_sessions"]
    assert rec["x96_loop_equals_rebuild"]
    assert rec["x96_probe_rows"] > 0
    assert rec["x96_flatness_excl_first"] < 2.5
    # the width lever must actually cut the clustered-corpus candidate
    # volume severalfold or the finding is mis-diagnosed (first run
    # measured 7.8x candidates, 10.7x candidate-stage wall)
    assert rec["x96_candidate_ratio"] > 5, rec["x96_candidate_ratio"]
    rec["all_assertions_pass"] = True

    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r07_newops.json")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    run(args.out, args.sf_dir)
