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
