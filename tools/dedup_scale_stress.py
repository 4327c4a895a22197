"""Scale-stress the dedup/ANN family on a skewed corpus beyond sf0.1
(VERDICT r3 item 4). Writes one JSON record to STRESS_r{N}.json.

Corpus: stream_sentinel_spark.testing.make_skewed_corpus — a hot
near-dup cluster (the single-bucket C(n,2) explosion), planted
near-dup pairs, i.i.d. background. The true pair set is analytically
known (hot-cluster pairs + planted pairs; random 50-word background
docs cannot reach 0.8 trigram Jaccard), and was cross-checked against
the exhaustive x02 oracle at 12 500 docs: x19 emitted exactly the
oracle's 125 375 pairs (recall 1.0). That lets the 50k run measure
recall without a quadratic oracle.

What is measured/asserted:
- x19 (minhash_verified_pairs) at 12.5k/25k/50k docs, cluster and
  planted counts scaled proportionally: wall time, pair counts, recall
  vs the analytic truth, and SUBLINEARITY — t(50k)/t(12.5k) must stay
  far below the 16x the pair space grows.
- x08 (minhash_lsh_candidates) at 50k: candidate count + time.
- x61 (minhash_pairs_between) at 50k split 40k old x 10k new: only
  cross pairs, recall of cross planted pairs.
- salted-plan equivalence at 50k: _hot_salted_self_join with
  cutoff=256 (forces the salted regime on the 2 000-row hot buckets)
  must emit the identical distinct pair set as the default plan.
- x02 (ngram_jaccard_pairs, exhaustive) at 12.5k only — its prefix
  regime is quadratic in the hot cluster by contract; the recorded
  number documents why x19 is the scale path.
- x70 (containment_pairs, min_size=5) at all three scales: the hot
  cluster's shingles are the vocab's most frequent, so rare-feature
  blocking must absorb the C(hot,2) explosion entirely; planted
  coverage is asserted, and wall time is asserted bounded by the pair
  space (not sublinear — see the assertion comment for why this
  fixed-vocab fixture makes the blocked candidate space track the
  pair space).

Run:  python tools/dedup_scale_stress.py [--full] [--out STRESS.json]
      (--full adds the 6-minute exhaustive x02 oracle pass)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def truth_size(hot: int, planted: int) -> int:
    return hot * (hot - 1) // 2 + planted


def run(full: bool, out_path: str) -> dict:
    from stream_sentinel_spark.operators.dedup import (
        _banded_keys,
        _hot_salted_self_join,
        minhash_lsh_candidates,
        minhash_pairs_between,
        minhash_verified_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from stream_sentinel_spark.testing import make_skewed_corpus, stress_session

    spark = stress_session()
    rec: dict = {"scales": [], "sf01_docs": 5000}

    corpora = {}
    for n, hot, planted in ((12_500, 500, 625), (25_000, 1_000, 1_250), (50_000, 2_000, 2_500)):
        c = make_skewed_corpus(
            spark, n_docs=n, hot_cluster=hot, planted_pairs=planted
        )
        c.docs.localCheckpoint(eager=True)
        corpora[n] = (c, hot, planted)

    # --- x19 across scales -------------------------------------------------
    for n, (c, hot, planted) in corpora.items():
        t0 = time.time()
        v = minhash_verified_pairs(c.docs, "doc_id", "text", threshold=0.8)
        found = v.count()
        dt = time.time() - t0
        planted_hit = v.join(c.planted, ["a_id", "b_id"]).count()
        truth = truth_size(hot, planted)
        rec["scales"].append(
            {
                "n_docs": n,
                "hot_cluster": hot,
                "planted_pairs": planted,
                "true_pairs": truth,
                "x19_pairs": found,
                "x19_sec": round(dt, 2),
                "x19_recall": round(found / truth, 6),
                "planted_recall": round(planted_hit / planted, 6),
            }
        )
        print(f"x19 n={n}: {found} pairs in {dt:.1f}s "
              f"(recall {found/truth:.4f})", flush=True)

    s = {r["n_docs"]: r for r in rec["scales"]}
    rec["x19_time_ratio_50k_over_12k"] = round(
        s[50_000]["x19_sec"] / s[12_500]["x19_sec"], 2
    )
    rec["pair_space_ratio"] = 16.0

    big, hot_big, planted_big = corpora[50_000]

    # --- x08 candidates at 50k ---------------------------------------------
    t0 = time.time()
    n_cand = minhash_lsh_candidates(big.docs, "doc_id", "text").count()
    rec["x08_candidates_50k"] = n_cand
    rec["x08_sec_50k"] = round(time.time() - t0, 2)
    print(f"x08 candidates at 50k: {n_cand} in {rec['x08_sec_50k']}s", flush=True)

    # --- x61 incremental at 50k (40k old x 10k new) ------------------------
    old = big.docs.filter(F.col("doc_id") % 5 != 0).localCheckpoint(eager=True)
    new = big.docs.filter(F.col("doc_id") % 5 == 0).localCheckpoint(eager=True)
    t0 = time.time()
    cross = minhash_pairs_between(old, new, "doc_id", "text", threshold=0.8)
    n_cross = cross.count()
    rec["x61_sec_50k"] = round(time.time() - t0, 2)
    # planted cross pairs: consecutive (even, odd) ids — exactly one of
    # the two sides lands in `new` iff a_id % 5 == 0 xor b_id % 5 == 0
    planted_cross = big.planted.filter(
        (F.col("a_id") % 5 == 0) != (F.col("b_id") % 5 == 0)
    )
    n_planted_cross = planted_cross.count()
    # cross emits (old_id, new_id); normalize to (min,max) to compare
    norm = cross.select(
        F.least("a_id", "b_id").alias("a_id"), F.greatest("a_id", "b_id").alias("b_id")
    )
    hit_cross = norm.join(planted_cross, ["a_id", "b_id"]).count()
    rec["x61_cross_pairs_50k"] = n_cross
    rec["x61_planted_cross"] = n_planted_cross
    rec["x61_planted_cross_recall"] = round(hit_cross / n_planted_cross, 6)
    # analytic cross truth: hot pairs with exactly one side % 5 == 0
    hot_new = hot_big // 5
    cross_truth = hot_new * (hot_big - hot_new) + n_planted_cross
    rec["x61_cross_truth"] = cross_truth
    rec["x61_cross_recall"] = round(n_cross / cross_truth, 6)
    print(f"x61 cross pairs: {n_cross}/{cross_truth} in {rec['x61_sec_50k']}s", flush=True)

    # --- salted-plan equivalence at 50k ------------------------------------
    sig = minhash_signatures(big.docs, "doc_id", "text")
    keyed = _banded_keys(sig, 64, 16)
    plain = (
        _hot_salted_self_join(keyed, ["band", "bucket"])
        .select("a_id", "b_id").distinct().localCheckpoint(eager=True)
    )
    t0 = time.time()
    salted = (
        _hot_salted_self_join(keyed, ["band", "bucket"], cutoff=256)
        .select("a_id", "b_id").distinct().localCheckpoint(eager=True)
    )
    rec["salted_sec_50k"] = round(time.time() - t0, 2)
    only_plain = plain.join(salted, ["a_id", "b_id"], "left_anti").count()
    only_salted = salted.join(plain, ["a_id", "b_id"], "left_anti").count()
    rec["salted_equal"] = only_plain == 0 and only_salted == 0
    rec["salted_pairs"] = salted.count()
    print(f"salted(256) == plain: {rec['salted_equal']} "
          f"({rec['salted_pairs']} pairs)", flush=True)

    # --- x70 containment: rare blocking must absorb the hot cluster --------
    # The hot cluster's shingles are the vocabulary's MOST frequent, so
    # rare-feature blocking excludes them by construction: the C(hot,2)
    # explosion that forces x19 into salting never reaches x70's pair
    # join. The min-size floor removes small-set noise; what's left is
    # planted near-dups whose rare-universe containment clears 0.9.
    from stream_sentinel_spark.operators.dedup import containment_pairs

    rec["x70"] = []
    for n, (c, hot, planted) in corpora.items():
        t0 = time.time()
        cp = containment_pairs(
            c.docs, "doc_id", "text", n=3, threshold=0.9, rare_frac=0.2,
            min_size=5,
        ).localCheckpoint(eager=True)
        n_cp = cp.count()
        dt = time.time() - t0
        n_hot = cp.filter((F.col("a_id") < hot) & (F.col("b_id") < hot)).count()
        n_pl = cp.join(c.planted, ["a_id", "b_id"]).count()
        rec["x70"].append(
            {
                "n_docs": n,
                "pairs": n_cp,
                "hot_pairs": n_hot,
                "planted_hit": n_pl,
                "planted": planted,
                "sec": round(dt, 2),
            }
        )
        print(f"x70 n={n}: {n_cp} pairs in {dt:.1f}s "
              f"(hot {n_hot}, planted {n_pl}/{planted})", flush=True)
    s70 = {r["n_docs"]: r for r in rec["x70"]}
    rec["x70_time_ratio_50k_over_12k"] = round(
        s70[50_000]["sec"] / s70[12_500]["sec"], 2
    )

    # --- exhaustive oracle cross-check (optional, quadratic) ---------------
    if full:
        c12, hot12, planted12 = corpora[12_500]
        t0 = time.time()
        n02 = ngram_jaccard_pairs(c12.docs, "doc_id", "text", threshold=0.8).count()
        rec["x02_pairs_12k"] = n02
        rec["x02_sec_12k"] = round(time.time() - t0, 2)
        rec["x19_matches_exhaustive_12k"] = n02 == s[12_500]["x19_pairs"]
        print(f"x02 exhaustive at 12.5k: {n02} in {rec['x02_sec_12k']}s", flush=True)

    # --- assertions (the recorded claims must actually hold) ---------------
    assert all(r["planted_recall"] >= 0.99 for r in rec["scales"])
    assert all(r["x19_recall"] >= 0.999 for r in rec["scales"])
    assert rec["x19_time_ratio_50k_over_12k"] < 8.0, "x19 must be sublinear in pairs"
    assert rec["x61_cross_recall"] >= 0.999
    assert rec["salted_equal"]
    # x70: hot cluster absorbed by blocking (vs C(hot,2) up to 2M pairs)
    # and planted coverage stable. Time is NOT asserted sublinear: the
    # blocked candidate space is ≤ cutoff² per rare shingle, and on this
    # FIXED-vocab fixture every shingle's df (hence the rank cutoff)
    # scales with n_docs, so the candidate space grows with the pair
    # space itself (measured ~9x warm for the 16x pair space). That is
    # the honest contract: containment blocking bounds cost by the df
    # distribution's tail, not by LSH-style signature collisions — x19
    # stays the sublinear path for symmetric near-dup, and production
    # containment runs cap df absolutely on growing-vocab corpora.
    assert all(r["hot_pairs"] <= r["n_docs"] // 250 for r in rec["x70"])
    assert all(r["planted_hit"] >= 0.9 * r["planted"] for r in rec["x70"])
    assert rec["x70_time_ratio_50k_over_12k"] < 16.0
    rec["all_assertions_pass"] = True

    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "scales"}))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="add the exhaustive x02 oracle pass")
    ap.add_argument("--out", default="STRESS_r04.json")
    args = ap.parse_args()
    run(args.full, args.out)
