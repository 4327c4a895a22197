"""Append-growth stress for the persisted ingest indexes (round 6):
prove the per-batch cost of the production ingest loop (match → accept
→ append) stays FLAT as the index grows — the round-5 verdict's "Done"
criterion for the APPEND feature beyond the bit-equality tests.

Protocol per family (text MinHash / embedding sign-LSH):
- build the index on a BASE slice of the stress corpus;
- N append rounds: append a fresh batch (append_*_index), then match a
  FIXED probe batch (match_*_index) — recording both wall times per
  round while the index grows ~4×;
- after the last round, rebuild the index from scratch over
  base+appends and assert the probe match is bit-identical to the
  grown-by-append index (N appends ≡ one rebuild, at stress scale);
- then COMPACT the grown index (compact_minhash_index /
  compact_lsh_index — Exchange-free one-file-per-bucket rewrite) and
  re-match: the probe must stay bit-identical while the file count
  collapses and the match wall returns toward the build-time cost —
  the proof that the observed match drift is the accumulated
  small-files cost of appends, not index size, and that the ingest
  loop's compact_every knob genuinely resets it;
- flatness: append wall is O(batch) by construction (the corpus is
  never rescanned) — assert last/first < 2.5; match wall may grow
  with accumulated FILES between compactions (bucket-local,
  Exchange-free — the join never reshuffles), so assert its growth
  stays under the index growth factor and that compaction restores it.

Run:  python tools/index_append_stress.py [--out STRESS_r06_append.json]
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

N_APPENDS = 4


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def run(out_path: str) -> dict:
    from pyspark.sql import SparkSession

    from stream_sentinel_spark.operators.dedup import (
        append_minhash_index,
        build_minhash_index,
        compact_minhash_index,
        match_minhash_index,
    )
    from stream_sentinel_spark.operators.similarity import (
        append_lsh_index,
        build_lsh_index,
        compact_lsh_index,
        match_lsh_index,
    )
    from stream_sentinel_spark.testing import (
        make_skewed_corpus,
        make_skewed_embeddings,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_apx_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rec: dict = {"n_appends": N_APPENDS}

    def family(
        tag, frame, id_col, base_pred, batch_pred, probe_pred,
        build, append, match, match_cols, row_table_suffix, compact,
    ):
        base = frame.filter(base_pred)
        probe = frame.filter(probe_pred)
        t0 = time.time()
        build(base, f"apx_{tag}")
        out = {
            "build_sec": round(time.time() - t0, 2),
            "base_rows": base.count(),
            "probe_rows": probe.count(),
            "append_sec": [],
            "match_sec": [],
            "index_rows": [],
        }
        for r in range(N_APPENDS):
            batch = frame.filter(batch_pred(r))
            t0 = time.time()
            append(batch, f"apx_{tag}")
            out["append_sec"].append(round(time.time() - t0, 2))
            t0 = time.time()
            got = _rows(match(spark, probe, f"apx_{tag}"), match_cols)
            out["match_sec"].append(round(time.time() - t0, 2))
            out["index_rows"].append(
                spark.table(f"apx_{tag}{row_table_suffix}").count()
            )
        # N appends == one rebuild, proven at stress scale on the probe
        from functools import reduce
        from operator import or_

        full = frame.filter(
            reduce(or_, [batch_pred(r) for r in range(N_APPENDS)], base_pred)
        )
        build(full, f"apx_{tag}_rebuilt")
        want = _rows(match(spark, probe, f"apx_{tag}_rebuilt"), match_cols)
        out["match_rows"] = len(got)
        out["append_equals_rebuild"] = got == want

        # compaction resets the small-files drift; results bit-identical
        out["files_before_compact"] = len(
            spark.table(f"apx_{tag}_bands").inputFiles()
        )
        t0 = time.time()
        compact(spark, f"apx_{tag}")
        out["compact_sec"] = round(time.time() - t0, 2)
        out["files_after_compact"] = len(
            spark.table(f"apx_{tag}_bands").inputFiles()
        )
        t0 = time.time()
        got_c = _rows(match(spark, probe, f"apx_{tag}"), match_cols)
        out["match_after_compact_sec"] = round(time.time() - t0, 2)
        out["compact_preserves_match"] = got_c == got
        assert out["compact_preserves_match"], f"{tag}: compaction drifted"
        assert out["files_after_compact"] < out["files_before_compact"]
        growth = out["index_rows"][-1] / out["index_rows"][0]
        out["index_growth"] = round(growth, 2)
        out["append_ratio_last_over_first"] = round(
            out["append_sec"][-1] / out["append_sec"][0], 2
        )
        out["match_ratio_last_over_first"] = round(
            out["match_sec"][-1] / out["match_sec"][0], 2
        )
        print(f"{tag}: {json.dumps(out)}", flush=True)
        assert out["append_equals_rebuild"], f"{tag}: append drifted from rebuild"
        assert out["match_rows"] > 0, f"{tag}: vacuous probe"
        assert out["append_ratio_last_over_first"] < 2.5, (
            f"{tag}: append cost grew with index size"
        )
        assert out["match_ratio_last_over_first"] < growth, (
            f"{tag}: match cost grew as fast as the index itself"
        )
        return out

    # text family: 40k docs — base 10k, 4 appends x 5k, fixed 5k probe
    c = make_skewed_corpus(spark, n_docs=40_000)
    docs = c.docs.localCheckpoint(eager=True)
    m = F.col("doc_id") % 8
    rec["minhash"] = family(
        "doc", docs, "doc_id",
        m < 2, lambda r: m == (2 + r), m == 7,
        lambda df, t: build_minhash_index(df, t, num_hashes=32, bands=8),
        append_minhash_index,
        lambda s, df, t: match_minhash_index(s, df, t, threshold=0.8),
        ("new_id", "n_matches", "best_jaccard", "first_match"),
        "_verify",
        compact_minhash_index,
    )

    # embedding family: 20k vecs — base 5k, 4 appends x 2.5k, 2.5k probe
    e = make_skewed_embeddings(
        spark, n_vecs=20_000, hot_cluster=1_000, planted_pairs=1_000, n_queries=0
    )
    vecs = e.vectors.localCheckpoint(eager=True)
    mv = F.col("vec_id") % 8
    rec["lsh"] = family(
        "emb", vecs, "vec_id",
        mv < 2, lambda r: mv == (2 + r), mv == 7,
        lambda df, t: build_lsh_index(df, t, bits=64, bands=8),
        append_lsh_index,
        lambda s, df, t: match_lsh_index(s, df, t, threshold=0.9),
        ("new_id", "n_matches", "best_cos", "first_match"),
        "_vecs",
        compact_lsh_index,
    )

    rec["all_assertions_pass"] = True
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r06_append.json")
    args = ap.parse_args()
    run(args.out)
