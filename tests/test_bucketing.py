"""Bucketed co-located joins: the write-time shuffle must remove the
read-time Exchange — the plan proves it, not the row counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.sources.batch import load_table
from stream_sentinel_spark.sources.bucketing import bucketed, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    write_bucketed(
        orders, "b_orders", ["o_custkey"], 4,
        sort_cols=["o_custkey"], path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ["o_custkey"], 4,
        sort_cols=["o_custkey"], path=str(tmp_path / "b_customer"),
    )
    joined = bucketed(spark, "b_orders").join(
        bucketed(spark, "b_customer"), "o_custkey"
    )
    plan = plan_of(joined)
    assert "Exchange" not in plan, plan
    # row-parity against the unbucketed join
    expect = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).count()
    assert joined.count() == expect

    # aggregation on the bucket key is exchange-free too
    agg = bucketed(spark, "b_orders").groupBy("o_custkey").count()
    assert "Exchange" not in plan_of(agg), plan_of(agg)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_unbucketed_join_does_exchange(spark, no_broadcast):
    """Control: the same join over bare parquet shuffles both sides —
    if this ever stops holding, the assertion above proves nothing."""
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    plan = plan_of(orders.join(customer, orders.o_custkey == customer.c_custkey))
    assert "Exchange" in plan, plan
