"""The engine's SQL surface: registered views + spark.sql over the
corpus tables (the reference has no SQL parser at all — SURVEY §2.6;
here it comes with Catalyst for free and must not be broken)."""

from __future__ import annotations

from stream_sentinel_spark.sources import TABLES, register_tables

SF_DIR = "/root/testdata/sf0.001"


def test_register_and_query(spark):
    register_tables(spark, SF_DIR)
    for t in TABLES:
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {t}").collect()[0]["n"] >= 0
    row = spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY n DESC LIMIT 1
        """
    ).collect()[0]
    assert row["n"] > 0


def test_sql_matches_dataframe_plan(spark):
    register_tables(spark, SF_DIR)
    sql_rows = spark.sql(
        "SELECT event_id FROM events WHERE value > 250.0"
    ).collect()
    from stream_sentinel_spark.plans import corpus

    df_rows = corpus.queries()["q03_threshold_rule"](spark, SF_DIR).collect()
    assert sorted(r["event_id"] for r in sql_rows) == sorted(
        r["event_id"] for r in df_rows
    )


def test_sketch_metrics_accuracy(spark):
    """x22's sketch accuracy against exact values on the same data: the
    HLL bound column must hold, and the exact-regime percentiles must
    sit at their nearest-rank targets."""
    from stream_sentinel_spark.plans import corpus
    from stream_sentinel_spark.sources.batch import load_table

    got = {
        r["event_type"]: r
        for r in corpus.queries()["x22_sketch_metrics"](spark, SF_DIR).collect()
    }
    rows = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", "user_id", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    users: dict[str, set] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    assert set(got) == set(by_type) and got
    for et, vals in by_type.items():
        g = got[et]
        # the corpus entry compares the HLL estimate to its 3·rsd bound
        assert g["approx_users_ok"] is True
        # percentile_approx returns actual data values; with
        # accuracy=10000 and these group sizes the rank is exact —
        # assert each reported value sits within 1 rank of its target
        vals.sort()
        n = len(vals)
        assert g["p50_value"] <= g["p95_value"] <= g["p99_value"]
        for p, v in ((0.5, g["p50_value"]), (0.95, g["p95_value"]), (0.99, g["p99_value"])):
            target = min(n - 1, max(0, round(p * (n - 1))))
            window = vals[max(0, target - 1): min(n, target + 2)]
            assert window[0] <= v <= window[-1], (et, p, v, window)
