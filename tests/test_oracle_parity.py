"""Local replica of the driver's t2 correctness gate: every queries()
entry vs its oracle_sql() through DuckDB, compared after sorting columns
by name and rows by value — any mismatch here is a mismatch in
CORRECTNESS_r{N}.json.

Runs at sf0.001 for speed (the driver uses sf0.01; run
``SS_ORACLE_SF=/root/testdata/sf0.01 pytest tests/test_oracle_parity.py``
before committing corpus changes).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SS_ORACLE_SF", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_driver_priority_rotation():
    """The driver gate covers the first 50 queries() entries. Data-driven
    invariant: apart from the flagship pipeline (re-proven every round),
    every gate slot must hold a query with NO row in any recorded
    CORRECTNESS_r*.json yet — slots spent on already-proven queries are
    wasted proof opportunities."""
    import glob
    import json

    from stream_sentinel_spark.plans import corpus

    assert set(corpus._DRIVER_PRIORITY) <= set(QUERIES)
    assert len(corpus._DRIVER_PRIORITY) == len(set(corpus._DRIVER_PRIORITY)) == 50
    first50 = list(QUERIES)[:50]
    assert first50 == corpus._DRIVER_PRIORITY

    proven: set[str] = set()
    for path in glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")):
        with open(path) as fh:
            proven |= set(json.load(fh))
    if not proven:  # fresh clone without driver artifacts: nothing to check
        return
    wasted = (set(first50) & proven) - {"detect_pipeline"}
    assert not wasted, f"gate slots wasted on driver-proven queries: {sorted(wasted)}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    got = normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = normalize(duck_run(ORACLES[name]))

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                if pd.isna(a) and pd.isna(b):
                    continue
                assert a == b or math.isclose(a, b, rel_tol=0, abs_tol=0), (
                    f"{name}.{col}[{i}]: {a!r} != {b!r} (diff {a - b!r})"
                )
        else:
            gl = ["__NULL__" if pd.isna(x) else x for x in g]
            wl = ["__NULL__" if pd.isna(x) else x for x in w]
            for i, (a, b) in enumerate(zip(gl, wl)):
                assert a == b, f"{name}.{col}[{i}]: {a!r} != {b!r}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 3
