"""Bucketed-table utilities — shuffle-free co-located joins at scale.

A fact-to-fact join at 100 TB is dominated by the shuffle of both sides.
Writing the tables bucketed by the join key (same bucket count) lets
Spark plan a SortMergeJoin with NO Exchange on either side — the
co-location was paid once at write time and amortized over every later
join/aggregation on that key. This is the standard layout decision for
repeatedly-joined event/fact tables (the streaming engine's alert and
event archives, the curation pipeline's doc/pair tables).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Bucket count is a layout contract: both sides of a co-located join
    must use the same ``num_buckets``. Sorting within buckets
    additionally removes the Sort from SortMergeJoin."""
    writer = df.write.format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession) -> None:
    """Session settings under which bucketed joins actually skip the
    shuffle (bucketing on; disable auto-broadcast so small test tables
    still demonstrate the SMJ plan shape)."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
