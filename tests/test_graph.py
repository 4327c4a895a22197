"""Unit tests for operators/graph.py (x46 locks cross-engine parity;
these lock the contracts on crafted graphs)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.operators.graph import (
    handoff_edges,
    pagerank,
    pagerank_oracle_sql,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight long")


def test_pagerank_two_node_cycle_uniform(spark):
    # a ↔ b is symmetric: ranks stay exactly 1/2 every iteration
    out = {r.node: r.rank for r in pagerank(_edges(spark, [(1, 2, 1), (2, 1, 1)])).collect()}
    assert out == {1: 0.5, 2: 0.5}


def test_pagerank_hand_computed_one_iteration(spark):
    # star: 1→3, 2→3; N=3, start 1/3 each
    # pr(3) = 0.15/3 + 0.85*(1/3 + 1/3) = 0.616667; pr(1)=pr(2)=0.05
    out = {
        r.node: r.rank
        for r in pagerank(_edges(spark, [(1, 3, 1), (2, 3, 1)]), iterations=1).collect()
    }
    assert out[1] == out[2] == 0.05
    assert abs(out[3] - (0.05 + 0.85 * 2 / 3)) < 1e-6


def test_pagerank_weighted_split(spark):
    # 1 → 2 with weight 3, 1 → 3 with weight 1: 2 gets 3/4 of 1's mass
    out = {
        r.node: r.rank
        for r in pagerank(_edges(spark, [(1, 2, 3), (1, 3, 1)]), iterations=1).collect()
    }
    base = 0.15 / 3
    assert abs(out[2] - (base + 0.85 * (1 / 3) * 0.75)) < 1e-6
    assert abs(out[3] - (base + 0.85 * (1 / 3) * 0.25)) < 1e-6


def test_pagerank_dangling_mass_not_redistributed(spark):
    # 1 → 2, 2 dangles: total mass after an iteration is < 1 (contract)
    out = pagerank(_edges(spark, [(1, 2, 1)]), iterations=2).collect()
    total = sum(r.rank for r in out)
    assert total < 1.0


def test_pagerank_rejects_bad_iterations(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [(1, 2, 1)]), iterations=0)


def test_handoff_edges_consecutive_distinct(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # stream "a": users 1, 1, 2, 1 → edges 1→2, 2→1 (self-loop dropped)
        (1, t0, 1, "a", 0.0),
        (2, t0 + dt.timedelta(seconds=1), 1, "a", 0.0),
        (3, t0 + dt.timedelta(seconds=2), 2, "a", 0.0),
        (4, t0 + dt.timedelta(seconds=3), 1, "a", 0.0),
        # stream "b": single event → no edge
        (5, t0, 9, "b", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {(r.src, r.dst): r.weight for r in handoff_edges(df).collect()}
    assert got == {(1, 2): 1, (2, 1): 1}


def test_oracle_sql_matches_spark_on_crafted_graph(spark):
    import duckdb

    rows = [(1, 2, 3), (1, 3, 1), (2, 3, 1), (3, 1, 2)]
    got = {
        r.node: r.rank for r in pagerank(_edges(spark, rows), iterations=3).collect()
    }
    edges_cte = "SELECT * FROM (VALUES " + ", ".join(
        f"({s}, {d}, {w})" for s, d, w in rows
    ) + ") AS t(src, dst, weight)"
    want = {
        int(n): r
        for n, r in duckdb.sql(pagerank_oracle_sql(edges_cte, iterations=3)).fetchall()
    }
    assert got == want
