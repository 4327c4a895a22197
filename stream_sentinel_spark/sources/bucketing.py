"""Bucketed-table utilities — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem,
events x events) is the Exchange: both sides shuffle their full volume
on the join key every time the join runs. Bucketing moves that shuffle
to WRITE time, once: `bucketBy(n, key)` hash-partitions files on disk
exactly the way the join would, so Catalyst plans the join with NO
Exchange on either bucketed side (and no Sort either, when `sortBy`
matches the join key). Every subsequent join/aggregation on the bucket
key is map-side.

Rules that make it actually work (each violation silently re-adds the
Exchange — the plan-shape test in tests/test_bucketing.py is the
guard):

- both sides bucketed by the SAME columns into the SAME bucket count
  (or a divisor — Spark can coalesce adjacent buckets when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is on);
- the join keys must be exactly the bucket columns (a cast on the key
  defeats it);
- bucketed tables are metastore tables (`saveAsTable`), not bare
  parquet paths — the bucket spec lives in the catalog.

The reference engine has no storage layer at all (Kafka in, Kafka out
— SURVEY §2.1); bucketing is part of this engine's batch-surface scale
design, same family as `operators/skew.py` and the broadcast hints in
`plans/corpus.py`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a parquet metastore table bucketed (and
    optionally sorted) by ``bucket_cols``. Sorting by the bucket key
    additionally removes the Sort from sort-merge joins. ``path`` makes
    it an external table (the warehouse dir is a static config, so
    per-run locations must come through here)."""
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_plain(
    df: DataFrame, table: str, path: str | None = None, mode: str = "overwrite"
) -> None:
    """Unbucketed parquet metastore table with the same external-path
    convention as :func:`write_bucketed` — the small side tables
    (stats, params) of the persisted dedup/similarity indexes."""
    w = df.write.format("parquet").mode(mode)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (plain
    ``spark.read.parquet(path)`` would drop it)."""
    return spark.table(table)
