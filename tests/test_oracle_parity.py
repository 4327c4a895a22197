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
    invariant: every query WITHOUT a passing driver row in any recorded
    CORRECTNESS_r*.json must occupy a gate slot — an unproven query left
    outside the gate is a wasted proof opportunity. (A row counts as
    passing only if rows/schema matched, the hash didn't mismatch, and no
    error was recorded — q53's round-3 row failed and so stays in the
    gate.) Once fewer unproven queries remain than slots, the surplus
    slots may re-prove already-proven queries (changed or perf-sensitive
    code), so the old "no proven query in the gate" check no longer
    applies."""
    import glob
    import json

    from stream_sentinel_spark.plans import corpus

    assert set(corpus._DRIVER_PRIORITY) <= set(QUERIES)
    assert len(corpus._DRIVER_PRIORITY) == len(set(corpus._DRIVER_PRIORITY)) == 50
    first50 = list(QUERIES)[:50]
    assert first50 == corpus._DRIVER_PRIORITY

    proven: set[str] = set()
    seen_any = False
    for path in glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")):
        seen_any = True
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if (
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") is not False
                    and row.get("err") is None
                ):
                    proven.add(name)
    if not seen_any:  # fresh clone without driver artifacts: nothing to check
        return
    unproven = set(QUERIES) - proven
    missing = unproven - set(first50)
    assert not missing, f"unproven queries left outside the driver gate: {sorted(missing)}"


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
