"""Salted aggregation / salted join: result equivalence with the
unsalted plans, salt determinism, and the two-phase plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.operators import skew
from stream_sentinel_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def test_salted_aggregate_equals_plain(spark, events):
    ev = events.withColumn("value_dec", F.col("value").cast("decimal(18,4)"))
    salted = skew.salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n": ("count", "*"),
            "s": ("sum", "value_dec"),
            "lo": ("min", "user_id"),
            "hi": ("max", "user_id"),
        },
        salt=8,
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value_dec").alias("s"),
        F.min("user_id").alias("lo"),
        F.max("user_id").alias("hi"),
    )
    key = lambda r: r["event_type"]  # noqa: E731
    assert sorted(map(tuple, salted.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, plain.collect()), key=lambda t: t[0]
    )


def test_salted_aggregate_rejects_non_algebraic(spark, events):
    with pytest.raises(ValueError, match="supports"):
        skew.salted_aggregate(events, ["event_type"], {"a": ("avg", "value")})


def test_salt_is_retry_deterministic(spark, events):
    """Same content → same salt on every evaluation (a random salt
    would corrupt results on task retry)."""
    ev = events.limit(500)
    s1 = skew.salted_aggregate(ev, ["event_type"], {"n": ("count", "*")}, salt=8)
    s2 = skew.salted_aggregate(ev, ["event_type"], {"n": ("count", "*")}, salt=8)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_salted_join_equals_plain_join(spark, events):
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0)],
        ["event_type", "weight"],
    )
    salted = skew.salted_join(events, dim, on=["event_type"], salt=4)
    plain = events.join(dim, "event_type")
    assert salted.count() == plain.count()
    sj = salted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
    )
    pj = plain.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w")
    )
    assert sorted(map(tuple, sj.collect())) == sorted(map(tuple, pj.collect()))


def test_two_phase_plan_shape(spark, events):
    """The salted aggregate must actually aggregate twice (partial per
    (key, salt), then merge) — i.e. the salt column reaches a hash
    aggregate before the final one."""
    plan = (
        skew.salted_aggregate(events, ["event_type"], {"n": ("count", "*")}, salt=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "__ss_salt" in plan


def test_join_size_probe_exact(spark):
    from stream_sentinel_spark.operators.skew import join_size_probe

    left = spark.createDataFrame(
        [("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string"
    )
    right = spark.createDataFrame([("a",)] * 4 + [("b",)], "k string")
    r = join_size_probe(left, right, ["k"]).collect()[0]
    assert (r["left_rows"], r["left_keys"]) == (6, 3)
    assert (r["right_rows"], r["right_keys"]) == (5, 2)
    assert r["matching_keys"] == 2
    assert r["join_rows"] == 3 * 4 + 2 * 1  # exact inner-join output size
    assert r["max_key_rows"] == 12
    # ground truth
    assert left.join(right, "k").count() == r["join_rows"]


def test_join_size_probe_self_join(spark):
    from stream_sentinel_spark.operators.skew import join_size_probe

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], "k string")
    r = join_size_probe(df, df, ["k"]).collect()[0]
    assert r["join_rows"] == 9 + 1
    assert r["left_rows"] == r["right_rows"] == 4


def test_join_size_probe_disjoint_keys(spark):
    from stream_sentinel_spark.operators.skew import join_size_probe

    a = spark.createDataFrame([("a",)], "k string")
    b = spark.createDataFrame([("z",)], "k string")
    r = join_size_probe(a, b, ["k"]).collect()[0]
    assert (r["matching_keys"], r["join_rows"], r["max_key_rows"]) == (0, 0, 0)


def test_zorder_value_interleaves(spark):
    from pyspark.sql import functions as F

    from stream_sentinel_spark.operators.partitioning import (
        zorder_sql_expr,
        zorder_value,
    )

    df = spark.createDataFrame(
        [(x, y) for x in [0, 1, 2, 3, 255] for y in [0, 1, 2, 3, 255]],
        "x long, y long",
    )
    rows = df.select(
        "x", "y", zorder_value(F.col("x"), F.col("y"), bits=8).alias("z")
    ).collect()

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["z"] == morton(r["x"], r["y"])
    # SQL mirror agrees (the oracle contract)
    import duckdb

    for x, y in [(3, 5), (255, 0), (170, 85)]:
        got = duckdb.sql(
            f"SELECT {zorder_sql_expr(str(x), str(y), bits=8)}"
        ).fetchone()[0]
        assert got == morton(x, y)


def test_zorder_buckets_bound_both_dims(spark):
    from pyspark.sql import functions as F

    from stream_sentinel_spark.operators.partitioning import zorder_layout_stats

    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x long, y long"
    )
    stats = zorder_layout_stats(
        df, F.col("x"), F.col("y"), bits=6, bucket_bits=4
    ).collect()
    assert len(stats) == 16
    for r in stats:
        # each top-4-bit bucket is a quadtree cell: a 16x32 (or 32x16)
        # rectangle — BOTH dims bounded, the skipping property
        assert (r["x_max"] - r["x_min"] + 1) * (r["y_max"] - r["y_min"] + 1) == 64 * 64 // 16
        assert r["n"] == 256


def test_zorder_value_int_columns_no_overflow(spark):
    """IntegerType inputs must not wrap at the bit-31 shiftleft."""
    from pyspark.sql import functions as F

    from stream_sentinel_spark.operators.partitioning import zorder_value

    df = spark.createDataFrame([(65535, 65535)], "x int, y int")
    z = df.select(zorder_value(F.col("x"), F.col("y"), bits=16).alias("z")).collect()[0]["z"]
    assert z == (1 << 32) - 1  # all 32 low bits set, positive
