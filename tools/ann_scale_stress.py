"""Scale-stress the embedding/ANN family on a skewed corpus beyond
sf0.1 (companion to tools/dedup_scale_stress.py; VERDICT r3 item 4
extended to the similarity operators). Writes STRESS_r04_ann.json.

Corpus: stream_sentinel_spark.testing.make_skewed_embeddings — a hot
near-dup cluster (one IVF cell / LSH bucket holding 10% of the corpus),
planted near-dup pairs with an analytic cosine floor, and CLUSTERED
background (realistic structure, safely below the 0.9 threshold).
sf0.1 has 2 000 embeddings; this runs 10-25x that.

What is measured/asserted:
- x07 scale path (cosine_pairs_lsh, bits=64 bands=8) at 20k vectors
  with a 1 000-vector hot cluster: recall vs the analytic truth
  (C(hot,2) + planted — background cannot reach 0.9), planted-pair
  recall, wall time. Exact verification makes false positives
  impossible, so found <= truth always.
- x20 (ivf_topk, 64 cells, nprobe 8) at 50k corpus x 500 held-out
  queries: recall@5 against the exact brute-force ranking, wall time
  for train+assign+probe vs the exact path, and survival of the hot
  cell (10% of the corpus in one cell = the join-skew case).

Round 5 adds --dim (default 64, the fixtures' width): at production
text-embedding widths (768-1536) cosine concentration tightens and the
signature computation switches to the Arrow matmul kernel
(similarity._SIG_EXPR_MAX regime) — the dim-768 run confirms the
recall/scan-fraction story holds there.

Run:  python tools/ann_scale_stress.py [--dim 768] [--out STRESS_r05_ann.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(out_path: str, dim: int = 64) -> dict:
    from stream_sentinel_spark.operators.similarity import (
        _SIG_EXPR_MAX,
        brute_force_topk,
        cosine_pairs_lsh,
        ivf_topk,
    )
    from stream_sentinel_spark.testing import make_skewed_embeddings, stress_session

    spark = stress_session()
    rec: dict = {
        "sf01_vecs": 2000,
        "dim": dim,
        "sig_kernel": "matmul" if dim * 64 > _SIG_EXPR_MAX else "expression",
    }

    # --- x07 scale path at 20k --------------------------------------------
    e20 = make_skewed_embeddings(
        spark, n_vecs=20_000, hot_cluster=1_000, planted_pairs=1_000,
        n_queries=0, dim=dim,
    )
    e20.vectors.localCheckpoint(eager=True)
    hot = e20.hot_ids[1]
    truth = hot * (hot - 1) // 2 + 1_000
    t0 = time.time()
    pairs = cosine_pairs_lsh(
        e20.vectors, "vec_id", "embedding", threshold=0.9, bits=64, bands=8,
        dim=dim,
    ).localCheckpoint(eager=True)
    found = pairs.count()
    rec["x07_sec_20k"] = round(time.time() - t0, 2)
    planted_hit = pairs.join(e20.planted, ["a_id", "b_id"]).count()
    rec["x07_pairs_20k"] = found
    rec["x07_truth_20k"] = truth
    rec["x07_recall_20k"] = round(found / truth, 6)
    rec["x07_planted_recall"] = round(planted_hit / 1_000, 6)
    min_cos = pairs.agg(F.min("cos")).first()[0]  # None iff zero pairs —
    # keep the number informative so a recall collapse fails on the
    # recall assertion below, not on round(None)
    rec["x07_min_found_cos"] = round(min_cos, 6) if min_cos is not None else None
    rec["x07_min_true_cos_floor"] = round(e20.min_true_cos, 6)
    print(
        f"x07 at 20k: {found}/{truth} pairs ({rec['x07_recall_20k']}) "
        f"in {rec['x07_sec_20k']}s, planted {rec['x07_planted_recall']}",
        flush=True,
    )

    # --- x20 IVF at 50k corpus x 500 queries --------------------------------
    e50 = make_skewed_embeddings(
        spark, n_vecs=50_000, hot_cluster=5_000, planted_pairs=1_000,
        n_queries=500, dim=dim,
    )
    e50.vectors.localCheckpoint(eager=True)
    e50.queries.localCheckpoint(eager=True)

    t0 = time.time()
    exact = brute_force_topk(
        e50.vectors, e50.queries, "vec_id", "embedding", k=5
    ).localCheckpoint(eager=True)
    rec["exact_topk_sec_50k"] = round(time.time() - t0, 2)

    # split train vs query phase: training is a one-off amortized cost
    # (and runs on a bounded sample at real scale), while the query
    # phase is what repeats — ivf's scale claim is about the latter
    from stream_sentinel_spark.operators.similarity import ivf_train

    t0 = time.time()
    centroids = ivf_train(e50.vectors, "vec_id", "embedding", n_cells=64, iters=3)
    rec["x20_train_sec_50k"] = round(time.time() - t0, 2)
    t0 = time.time()
    approx = ivf_topk(
        e50.vectors, e50.queries, "vec_id", "embedding",
        k=5, n_cells=64, nprobe=8, centroids=centroids,
    ).localCheckpoint(eager=True)
    rec["x20_query_sec_50k"] = round(time.time() - t0, 2)
    rec["x20_sec_50k"] = rec["x20_train_sec_50k"] + rec["x20_query_sec_50k"]
    # fraction of the corpus each query actually scans (the IVF lever:
    # nprobe/n_cells of the rows, vs 100% for brute force)
    from stream_sentinel_spark.operators.similarity import ivf_assign

    sizes = {
        r["cell"]: r["n"]
        for r in ivf_assign(e50.vectors, centroids, "vec_id", "embedding")
        .groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rec["x20_hot_cell_rows"] = max(sizes.values())
    rec["x20_cells_used"] = len(sizes)

    n_exact = exact.count()
    overlap = approx.select("q_id", "n_id").join(
        exact.select("q_id", "n_id"), ["q_id", "n_id"]
    ).count()
    rec["x20_recall_at_5"] = round(overlap / n_exact, 6)
    rec["x20_queries"] = 500
    print(
        f"x20 IVF at 50k: recall@5 {rec['x20_recall_at_5']} "
        f"in {rec['x20_sec_50k']}s (exact path {rec['exact_topk_sec_50k']}s)",
        flush=True,
    )

    # --- assertions ----------------------------------------------------------
    assert found <= truth, "exact verification can never exceed truth"
    assert rec["x07_recall_20k"] >= 0.98, "x07 LSH recall floor"
    assert rec["x07_planted_recall"] >= 0.99
    assert rec["x07_min_found_cos"] >= 0.9, "threshold honored"
    assert rec["x20_recall_at_5"] >= 0.9, "IVF recall floor at nprobe=8/64"
    rec["all_assertions_pass"] = True

    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r05_ann.json")
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()
    run(args.out, dim=args.dim)
