"""Measure the shuffle-byte delta of the xxhash64 key mode for the
gram/window join operators (x82 novelty_scores, x83
duplicated_window_rate) at sf0.1 — the round-5 verdict's forward-
looking scale nit: keying those shuffles on the raw gram/window STRING
moves ~k× the corpus text through the exchange; keying on xxhash64
moves 8-byte longs.

Method: run each operator in both key modes on the sf0.1 documents
table in a fresh-per-mode local session with the UI enabled, then sum
shuffle write bytes + records over all completed stages via the Spark
REST API (/api/v1/applications/<id>/stages). Fresh sessions keep the
stage ledger mode-pure. Also asserts both modes return identical rows.

Run:  python tools/hashkey_shuffle_probe.py [--out STRESS_r06_hashkey.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _session():
    import tempfile

    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .appName("hashkey-shuffle-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="ss_probe_"))
        .getOrCreate()
    )


def _shuffle_totals(spark) -> tuple[int, int]:
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        stages = json.load(resp)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def _measure(fn_name: str, key_mode: str, **kw) -> dict:
    """One operator run in a fresh session; returns bytes/records/rows."""
    from stream_sentinel_spark.operators import curation
    from stream_sentinel_spark.sources.batch import load_table

    spark = _session()
    try:
        docs = load_table(spark, SF_DIR, "documents")
        fn = getattr(curation, fn_name)
        t0 = time.perf_counter()
        rows = fn(docs, "doc_id", "text", key_mode=key_mode, **kw).collect()
        wall = time.perf_counter() - t0
        b, r = _shuffle_totals(spark)
        return {
            "shuffle_write_bytes": b,
            "shuffle_write_records": r,
            "wall_sec": round(wall, 2),
            "rows": sorted(tuple(x) for x in rows),
        }
    finally:
        spark.stop()


def run(out_path: str) -> dict:
    result: dict = {"sf_dir": SF_DIR}
    for fn_name, kw in (
        ("novelty_scores", {"n": 3}),
        ("duplicated_window_rate", {"k": 10}),
    ):
        per = {}
        for mode in ("string", "hash"):
            m = _measure(fn_name, mode, **kw)
            per[mode] = {k: v for k, v in m.items() if k != "rows"}
            per[mode]["_rows"] = m["rows"]
        assert per["string"]["_rows"] == per["hash"]["_rows"], (
            f"{fn_name}: key modes disagree at {SF_DIR}"
        )
        n_rows = len(per["hash"].pop("_rows"))
        per["string"].pop("_rows")
        per["rows_equal"] = True
        per["n_rows"] = n_rows
        per["bytes_ratio_string_over_hash"] = round(
            per["string"]["shuffle_write_bytes"]
            / max(per["hash"]["shuffle_write_bytes"], 1),
            2,
        )
        result[fn_name] = per
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="STRESS_r06_hashkey.json")
    args = ap.parse_args()
    print(json.dumps(run(args.out), indent=2))
