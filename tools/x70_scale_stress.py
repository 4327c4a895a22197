"""Re-measure x70 containment growth on a QUIET host (VERDICT r07
"What's wrong" #2): STRESS_r07_sf1 recorded 360.7 s at 150 k docs —
15.6× the r5 50 k wall for 3× the docs — but at loadavg 25.45, so the
record could not say whether the growth was contention or a
super-linear candidate fan-out in the rare-feature blocking. This
harness decomposes it: at 50 k / 100 k / 150 k docs (hot cluster and
planted pairs scaled the same way as sf1_scale_stress) it records,
per scale,

- bench-style host calibration + 1-min loadavg bracketing each
  measurement (a contended run is self-evident in the artifact);
- the FULL containment_pairs wall plus pairs / hot-pair / planted-hit
  correctness counters (the numbers COVERAGE.md reports);
- the blocking stage alone (_containment_doc_sets): rank position,
  blocked-doc count, and the total blocked set mass Σ|S_d|;
- the CANDIDATE-PAIR count of the prefix regime
  (_containment_prefix_candidates — the operator's own code path), the
  quantity the verify stage pays for and the direct witness of any
  quadratic fan-out.

Expected shape on this FIXED-vocab fixture (documented in
tools/dedup_scale_stress.py's assertion comment): every shingle's df
scales with n_docs, so the rank cutoff admits the same vocabulary
fraction whose per-shingle df grows ∝ n — the candidate space tracks
the PAIR space (~n²), not n log n. The artifact separates that
by-construction growth (candidates ratio) from host contention
(calibration ratio): wall_ratio ≈ candidate_ratio on a quiet host
means the r07 number was fan-out × contention, with the fan-out share
quantified.

Run:  python tools/x70_scale_stress.py [--out STRESS_r08_x70.json]
(~10-20 min; run on an otherwise idle host.)
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

SCALES = (
    (50_000, 2_000, 2_500),
    (100_000, 2_500, 5_000),
    (150_000, 3_000, 7_500),
)
THRESH = 0.9
RARE_FRAC = 0.2
MIN_SIZE = 5


def _load():
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        return None


def _calibration(spark) -> float:
    """bench.py's fixed reference workload (min-of-2): ~1 s uncontended
    on this hardware; see bench.calibration for the contract."""

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
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_x70_wh_"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def run(out_path: str) -> dict:
    from stream_sentinel_spark.operators.dedup import (
        _containment_doc_sets,
        _containment_prefix_candidates,
        containment_pairs,
    )
    from stream_sentinel_spark.testing import make_skewed_corpus

    spark = _session()
    rec: dict = {"scales": []}
    rec["calibration_pre"] = _calibration(spark)
    rec["loadavg_pre"] = _load()
    print(
        f"calibration {rec['calibration_pre']}s loadavg {rec['loadavg_pre']}",
        flush=True,
    )

    for n, hot, planted in SCALES:
        c = make_skewed_corpus(
            spark, n_docs=n, hot_cluster=hot, planted_pairs=planted
        )
        c.docs.localCheckpoint(eager=True)
        row: dict = {"n_docs": n, "hot_cluster": hot, "planted": planted}
        row["loadavg"] = _load()

        # full operator, exactly the x70 / sf1-stress call
        t0 = time.time()
        cp = containment_pairs(
            c.docs, "doc_id", "text", n=3, threshold=THRESH,
            rare_frac=RARE_FRAC, min_size=MIN_SIZE,
        ).localCheckpoint(eager=True)
        row["pairs"] = cp.count()
        row["sec"] = round(time.time() - t0, 2)
        row["hot_pairs"] = cp.filter(
            (F.col("a_id") < hot) & (F.col("b_id") < hot)
        ).count()
        row["planted_hit"] = cp.join(c.planted, ["a_id", "b_id"]).count()

        # decomposition: blocking stage, then the candidate space the
        # verify stage pays for — the operator's own internals
        t0 = time.time()
        doc_sets, pos = _containment_doc_sets(
            c.docs, "doc_id", "text", 3, RARE_FRAC, MIN_SIZE
        )
        mass = doc_sets.agg(
            F.count(F.lit(1)).alias("docs"), F.sum("sz").alias("mass")
        ).head()
        row["blocking_sec"] = round(time.time() - t0, 2)
        row["rank_pos"] = pos
        row["blocked_docs"] = mass.docs
        row["blocked_mass"] = mass.mass
        t0 = time.time()
        row["candidates"] = _containment_prefix_candidates(
            doc_sets, THRESH
        ).count()
        row["candidates_sec"] = round(time.time() - t0, 2)
        row["loadavg_after"] = _load()
        rec["scales"].append(row)
        print(
            f"x70 n={n}: {row['pairs']} pairs in {row['sec']}s "
            f"(candidates {row['candidates']} in {row['candidates_sec']}s, "
            f"blocked mass {row['blocked_mass']}, hot {row['hot_pairs']}, "
            f"planted {row['planted_hit']}/{planted})",
            flush=True,
        )

    rec["calibration_post"] = _calibration(spark)
    rec["loadavg_post"] = _load()
    s = {r["n_docs"]: r for r in rec["scales"]}
    rec["wall_ratio_150k_over_50k"] = round(
        s[150_000]["sec"] / s[50_000]["sec"], 2
    )
    rec["candidate_ratio_150k_over_50k"] = round(
        s[150_000]["candidates"] / max(s[50_000]["candidates"], 1), 2
    )
    rec["mass_ratio_150k_over_50k"] = round(
        s[150_000]["blocked_mass"] / max(s[50_000]["blocked_mass"], 1), 2
    )
    # correctness at every scale: blocking absorbs the hot cluster,
    # planted coverage holds (the sf1-stress assertions)
    assert all(r["hot_pairs"] <= r["n_docs"] // 250 for r in rec["scales"])
    assert all(
        r["planted_hit"] >= 0.9 * r["planted"] for r in rec["scales"]
    )
    # the decomposition must actually explain the wall: on a quiet host
    # (calibration ~1s) the wall ratio may not exceed the candidate-space
    # ratio by more than 2x — if it does, something other than the
    # documented fan-out is growing and the record is wrong
    if rec["calibration_pre"] <= 1.5 and rec["calibration_post"] <= 1.5:
        assert (
            rec["wall_ratio_150k_over_50k"]
            <= 2.0 * max(rec["candidate_ratio_150k_over_50k"], 1.0)
        ), "wall grew past the candidate space — unexplained"
        rec["quiet_host"] = True
    else:
        rec["quiet_host"] = False
    rec["all_assertions_pass"] = True

    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: v for k, v in rec.items() if k != "scales"}))
    return rec


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r08_x70.json")
    args = ap.parse_args()
    run(args.out)
