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


def spread_pairs(cands: DataFrame) -> DataFrame:
    """Re-spread a candidate-pair frame before expensive verification.

    Candidate (a_id, b_id) frames typically arrive from a ``distinct``,
    and AQE coalesces the post-shuffle stage by BYTES — millions of
    16-byte id pairs collapse to one or two partitions, which would
    serialize whatever runs in that stage (the vector joins, popcount
    filters, or Arrow kernels that do the real verification work) onto
    a couple of cores. Measured on the MinHash verify stage at sf0.1:
    15.8 s → 3.1 s. The explicit exchange moves only the slim id pairs
    — noise next to the work it parallelizes."""
    par = cands.sparkSession.sparkContext.defaultParallelism * 2
    return cands.repartition(par)
