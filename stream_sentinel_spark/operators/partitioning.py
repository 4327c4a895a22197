"""Partition-layout helpers shared by the per-row-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small(df: DataFrame) -> DataFrame:
    """At least one partition per core before per-row-heavy narrow work.

    A dimension-sized table (one parquet footer under
    `maxPartitionBytes`) scans as a SINGLE partition, which serializes
    every downstream per-row transform — shingling, minhash signatures,
    quadratic pair joins, Arrow UDF stages — onto one task no matter how
    many cores the cluster has. Measured at local[32]: the sf0.1 shingle
    pass 4.2 s → 0.2 s; the 2M-pair cosine stage ran one-core at ~10 s
    warm (50 s cold, absorbing JIT warm-up) before spreading.

    Inputs that already have ≥ one partition per core (any at-scale
    table) pass through untouched, so this never coalesces or reshuffles
    big data."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
