"""CSV/JSONL loaders: explicit-schema reads with the S2/S3
malformed-row contract (drop via corrupt-record column, never silent
NULLs, never job failure)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from stream_sentinel_spark.sources.batch import load_csv, load_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "score": 1.5}\n'
        '{"id": 2, "name": "b", "score": 2.5}\n'
        "this is not json\n"
        '{"id": 3, "name": "c", "score": 3.5}\n'
    )
    return str(p)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "rows.csv"
    p.write_text(
        "id,name,score\n"
        "1,a,1.5\n"
        "2,b,2.5\n"
        "not_a_number,c,xyz\n"
        "3,d,3.5\n"
    )
    return str(p)


def test_jsonl_drops_malformed(spark, jsonl_path):
    df = load_jsonl(spark, jsonl_path, SCHEMA)
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert df.schema == SCHEMA


def test_jsonl_quarantine_mode(spark, jsonl_path):
    df = load_jsonl(spark, jsonl_path, SCHEMA, drop_malformed=False)
    bad = df.filter(df["_corrupt_record"].isNotNull()).collect()
    assert len(bad) == 1
    assert "not json" in bad[0]["_corrupt_record"]


def test_csv_drops_malformed(spark, csv_path):
    df = load_csv(spark, csv_path, SCHEMA)
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert [r["name"] for r in rows] == ["a", "b", "d"]


def test_csv_quarantine_mode(spark, csv_path):
    df = load_csv(spark, csv_path, SCHEMA, drop_malformed=False)
    bad = df.filter(df["_corrupt_record"].isNotNull()).collect()
    assert len(bad) == 1
    assert bad[0]["_corrupt_record"].startswith("not_a_number")


def test_caller_schema_not_mutated(spark, jsonl_path):
    """StructType.add mutates in place — the loaders must copy."""
    before = len(SCHEMA.fields)
    load_jsonl(spark, jsonl_path, SCHEMA).collect()
    load_csv(spark, jsonl_path, SCHEMA).collect()
    assert len(SCHEMA.fields) == before
