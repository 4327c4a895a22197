"""Scale-stress the persisted ingest indexes (round 5): quantify what
storing the corpus side actually saves per batch, and prove the match
output is identical to the one-shot incremental operators at stress
scale.

Setup mirrors the dedup stress corpus (testing.make_skewed_corpus) and
the ANN stress embeddings: 40k existing docs / 10k incoming (the x61
cross-frame shape, id%5 interleave so hot-cluster and planted pairs
straddle the frames) and 16k existing vectors / 4k incoming. For each
family:

- build the index once (build_minhash_index / build_lsh_index) —
  recorded as the amortized one-off;
- run the per-batch match (match_minhash_index / match_lsh_index) N
  times and take the min — the steady-state ingest cost;
- run the one-shot incremental operator (incremental_neardups /
  cosine_pairs_lsh_incremental) on the same frames — what a pipeline
  WITHOUT the index pays per batch (it recomputes the corpus side's
  signatures every time);
- assert the match rows equal the one-shot rows EXACTLY.

Run:  python tools/index_scale_stress.py [--out STRESS_r05_index.json]
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

REPS = 3


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def run(out_path: str) -> dict:
    from stream_sentinel_spark.operators.dedup import (
        build_minhash_index,
        incremental_neardups,
        match_minhash_index,
    )
    from stream_sentinel_spark.operators.similarity import (
        build_lsh_index,
        cosine_pairs_lsh_incremental,
        match_lsh_index,
    )
    from pyspark.sql import SparkSession

    from stream_sentinel_spark.testing import (
        make_skewed_corpus,
        make_skewed_embeddings,
    )

    # testing.stress_session's exact config + a writable metastore
    # warehouse (static config — must be set at session build, so this
    # tool builds its own session instead of calling stress_session)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_idx_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rec: dict = {}

    # --- text family: 40k old x 10k new (id % 5 interleave — the
    # generator lays the hot cluster and planted pairs at LOW ids, so a
    # range split would put every near-dup inside one frame and make the
    # stress vacuous; the interleave straddles them, like x61's split) --
    c = make_skewed_corpus(spark, n_docs=50_000)
    docs = c.docs.localCheckpoint(eager=True)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)

    t0 = time.time()
    build_minhash_index(old, "sx_doc", num_hashes=32, bands=8)
    rec["minhash_build_sec"] = round(time.time() - t0, 2)

    match_cols = ("new_id", "n_matches", "best_jaccard", "first_match")
    best = None
    for _ in range(REPS):
        t0 = time.time()
        got = _rows(
            match_minhash_index(spark, new, "sx_doc", threshold=0.8), match_cols
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    rec["minhash_match_sec"] = round(best, 2)

    t0 = time.time()
    want = _rows(
        incremental_neardups(
            old, new, "doc_id", "text", num_hashes=32, bands=8, threshold=0.8
        ),
        match_cols,
    )
    rec["minhash_oneshot_sec"] = round(time.time() - t0, 2)
    rec["minhash_rows"] = len(got)
    rec["minhash_match_equals_oneshot"] = got == want
    rec["minhash_speedup"] = round(
        rec["minhash_oneshot_sec"] / rec["minhash_match_sec"], 2
    )
    print(
        f"minhash: match {rec['minhash_match_sec']}s vs one-shot "
        f"{rec['minhash_oneshot_sec']}s ({rec['minhash_speedup']}x), "
        f"{rec['minhash_rows']} rows equal={rec['minhash_match_equals_oneshot']}",
        flush=True,
    )

    # --- embedding family: 16k old x 4k new --------------------------------
    e = make_skewed_embeddings(
        spark, n_vecs=20_000, hot_cluster=1_000, planted_pairs=1_000, n_queries=0
    )
    vecs = e.vectors.localCheckpoint(eager=True)
    e_old = vecs.filter(F.col("vec_id") % 5 != 0)
    e_new = vecs.filter(F.col("vec_id") % 5 == 0)

    t0 = time.time()
    build_lsh_index(e_old, "sx_emb", bits=64, bands=8)
    rec["lsh_build_sec"] = round(time.time() - t0, 2)

    emb_cols = ("new_id", "n_matches", "best_cos", "first_match")
    best = None
    for _ in range(REPS):
        t0 = time.time()
        got_e = _rows(
            match_lsh_index(spark, e_new, "sx_emb", threshold=0.9), emb_cols
        )
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    rec["lsh_match_sec"] = round(best, 2)

    t0 = time.time()
    want_e = _rows(
        cosine_pairs_lsh_incremental(
            e_old, e_new, "vec_id", "embedding", threshold=0.9, bits=64, bands=8
        ),
        emb_cols,
    )
    rec["lsh_oneshot_sec"] = round(time.time() - t0, 2)
    rec["lsh_rows"] = len(got_e)
    rec["lsh_match_equals_oneshot"] = got_e == want_e
    rec["lsh_speedup"] = round(rec["lsh_oneshot_sec"] / rec["lsh_match_sec"], 2)
    print(
        f"lsh: match {rec['lsh_match_sec']}s vs one-shot "
        f"{rec['lsh_oneshot_sec']}s ({rec['lsh_speedup']}x), "
        f"{rec['lsh_rows']} rows equal={rec['lsh_match_equals_oneshot']}",
        flush=True,
    )

    assert rec["minhash_match_equals_oneshot"], "minhash match must be exact"
    assert rec["lsh_match_equals_oneshot"], "lsh match must be exact"
    assert rec["minhash_rows"] > 0 and rec["lsh_rows"] > 0, "non-vacuous"
    rec["all_assertions_pass"] = True
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r05_index.json")
    args = ap.parse_args()
    run(args.out)
