"""As-of join and point-in-time feature enrichment (operators/asof.py):
hand-computed fixtures pin match choice, tie visibility, tolerance
nulls, and the multi-table namespacing of point_in_time_join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from stream_sentinel_spark.operators.asof import asof_join, point_in_time_join


def _ts(s):
    return datetime.fromisoformat(s)


def _labels(spark):
    return spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-10 00:00:00")),
            (2, 100, _ts("2024-01-20 00:00:00")),
            (3, 200, _ts("2024-01-05 00:00:00")),  # before any feature
            (4, 200, _ts("2024-01-15 00:00:00")),
        ],
        "label_id long, user long, ts timestamp",
    )


def _balances(spark):
    return spark.createDataFrame(
        [
            (100, _ts("2024-01-01 00:00:00"), 10.0),
            (100, _ts("2024-01-15 00:00:00"), 20.0),
            (200, _ts("2024-01-15 00:00:00"), 99.0),  # == label 4's ts
        ],
        "user long, at timestamp, balance double",
    )


def _scores(spark):
    return spark.createDataFrame(
        [
            (100, _ts("2024-01-09 00:00:00"), 0.5),
            (200, _ts("2024-01-06 00:00:00"), 0.7),
        ],
        "uid long, at timestamp, score double",
    )


def test_point_in_time_two_tables(spark):
    out = point_in_time_join(
        _labels(spark),
        [
            {"name": "bal", "df": _balances(spark), "on": "user",
             "time": "at", "values": ["balance"]},
            {"name": "sc", "df": _scores(spark), "on": "user",
             "right_on": "uid", "time": "at", "values": ["score"]},
        ],
        label_time="ts",
    )
    got = {r.label_id: (r.bal__balance, r.sc__score) for r in out.collect()}
    assert got == {
        1: (10.0, 0.5),   # balance@01-01; score@01-09 not yet for label 1?
        2: (20.0, 0.5),
        3: (None, None),  # label precedes every feature row
        4: (99.0, 0.7),   # feature at exactly label time IS visible
    }


def test_point_in_time_tie_visibility(spark):
    # label 1 at 01-10: score written 01-09 is visible; at 01-09 exactly
    # it would also be (<= semantics) — pin the boundary
    labels = _labels(spark).filter("label_id = 1").withColumn(
        "ts", F.lit(_ts("2024-01-09 00:00:00"))
    )
    out = point_in_time_join(
        labels,
        [{"name": "sc", "df": _scores(spark), "on": "user",
          "right_on": "uid", "time": "at", "values": ["score"]}],
        label_time="ts",
    )
    assert out.collect()[0].sc__score == 0.5


def test_point_in_time_tolerance(spark):
    # 3-day staleness bound: label 2 (01-20) sees balance@01-15 (5 days
    # stale) null out, while label 4 (01-15, 0 days) keeps its match
    out = point_in_time_join(
        _labels(spark),
        [{"name": "bal", "df": _balances(spark), "on": "user",
          "time": "at", "values": ["balance"],
          "tolerance_ms": 3 * 86_400_000}],
        label_time="ts",
    )
    got = {r.label_id: r.bal__balance for r in out.collect()}
    assert got == {1: None, 2: None, 3: None, 4: 99.0}


def test_asof_matches_duckdb(spark):
    """The base operator against DuckDB's native ASOF JOIN on a random
    fixture — the engine extension vs the reference semantics."""
    import duckdb

    left = [(i, i % 5, _ts(f"2024-01-{(i % 27) + 1:02d} 00:00:00"))
            for i in range(60)]
    right = [(i % 5, _ts(f"2024-01-{(i % 9) * 3 + 1:02d} 00:00:00"), float(i))
             for i in range(40)]
    ldf = spark.createDataFrame(left, "lid long, k long, ts timestamp")
    rdf = (
        spark.createDataFrame(right, "k long, at timestamp, v double")
        .groupBy("k", "at").agg(F.max("v").alias("v"))
    )
    got = {
        r.lid: r.r_v
        for r in asof_join(
            ldf, rdf, on="k", left_time="ts", right_time="at",
            right_values=["v"],
        ).collect()
    }
    con = duckdb.connect()
    con.register("l", ldf.toPandas())
    con.register("r", rdf.toPandas())
    want = {
        int(lid): v
        for lid, v in con.sql(
            "SELECT l.lid, r.v FROM l ASOF LEFT JOIN r"
            " ON l.k = r.k AND r.at <= l.ts"
        ).fetchall()
    }
    assert got == want
