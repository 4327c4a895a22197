#!/usr/bin/env python
"""BENCH harness (SURVEY §7.1 M5, protocol in BASELINE.md).

Runs the full declared query corpus (``__spark_entry__.queries()``) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the ``noop`` sink (full execution, no
driver collect, no disk write) — the number measured is the distributed
plan's wall clock, which is what scales to a cluster. Progress goes to
stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stream-sentinel-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def materialize(df) -> int:
    """Run the plan to completion without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "1"))

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry_mod

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("WARN")

    qmap = entry_mod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in qmap.items():
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                materialize(fn(spark, sf_dir))
            except Exception as exc:  # never let one query sink the bench
                log(f"FAIL {name}: {exc}")
                best = float("nan")
                break
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        if best == best:  # not NaN
            total += best
        log(f"{name}: {timings[name]}s")

    print(
        json.dumps(
            {
                "metric": "corpus_total_wall",
                "value": round(total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "cpus": cpus,
                "spark": spark.version,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
