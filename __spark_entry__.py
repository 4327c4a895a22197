"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship 3-rule detection pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` — the declared corpus (FIXTURES.md):
detection algebra Q3-Q9, relational surface Q1-Q2/Q10-Q21, flagship
pipeline, and the training-data extension operators. Implementations
live in ``stream_sentinel_spark``; this module is the thin contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stream_sentinel_spark.plans import corpus


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full 3-rule
    detection pipeline compiled to one union-of-branches plan."""
    return corpus.queries()["detect_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return corpus.queries()


def oracle_sql() -> dict[str, str]:
    return corpus.oracle_sql()
