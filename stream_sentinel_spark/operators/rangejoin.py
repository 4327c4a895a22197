"""Banded range join — the time-proximity join Spark has no native
physical strategy for.

A condition like ``abs(l.ts - r.ts) <= tolerance`` is non-equi, so
Catalyst's only built-in plans are BroadcastNestedLoopJoin (needs one
tiny side) or CartesianProduct — both O(|L| x |R|) comparisons and the
cartesian one is O(partitions^2) tasks too. The banded form restores a
plain hash-partitioned equi-join at any scale:

- quantize time into integer buckets of width ``tolerance``;
- each LEFT row keeps its one bucket, each RIGHT row replicates to
  buckets (b-1, b, b+1) — a fixed 3x fan-out, independent of data size;
- equi-join on the bucket id, then apply the exact |dt| <= tolerance
  residual filter.

Any qualifying pair is within one bucket of each other, so it meets on
EXACTLY one equi key (the left row's bucket) — no post-join dedup. The
shuffle key is the bucket id: time-local, so hot seconds can skew —
mitigate by composing with a second join key (the usual case: "same
device within 1 s") or `operators/skew.salted_join` for the pure-time
variant.

Reference parity note: the reference engine has no joins at all
(SURVEY §2.6); this is a training-data-pipeline extension (event
correlation / sensor alignment), same family as `operators/asof.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_ms: int,
    extra_on: Column | None = None,
) -> DataFrame:
    """All pairs with ``|left.left_ts - right.right_ts| <= tolerance_ms``.

    Column names of ``left`` and ``right`` must be disjoint (alias
    before calling). ``extra_on`` optionally adds an equi/filter
    condition evaluated after the bucket join (e.g. same device id) —
    passing the equality here keeps it in the residual; to make it part
    of the shuffle key instead, pre-concatenate it into the timestamp
    frame's bucketing by calling range_join per group.

    Both timestamps are compared at millisecond precision
    (``unix_millis``), integer-exact and timezone-proof.
    """
    if tolerance_ms <= 0:
        raise ValueError(f"tolerance_ms must be positive, got {tolerance_ms}")
    tol = F.lit(int(tolerance_ms)).cast("long")
    l_ms = F.unix_millis(F.col(left_ts))
    r_ms = F.unix_millis(F.col(right_ts))
    # floor division of possibly-negative epochs: F.floor of the double
    # quotient would lose integer exactness past 2^53; use the
    # subtract-modulo identity to stay in longs.
    l_bucket = (l_ms - ((l_ms % tol) + tol) % tol) / tol
    r_bucket = (r_ms - ((r_ms % tol) + tol) % tol) / tol
    lb = left.withColumn("__rj_ms", l_ms).withColumn(
        "__rj_bucket", l_bucket.cast("long")
    )
    rb = (
        right.withColumn("__rj_rms", r_ms)
        .withColumn(
            "__rj_bucket",
            F.explode(
                F.array(
                    r_bucket.cast("long") - 1,
                    r_bucket.cast("long"),
                    r_bucket.cast("long") + 1,
                )
            ),
        )
    )
    residual = F.abs(F.col("__rj_ms") - F.col("__rj_rms")) <= tol
    if extra_on is not None:
        residual = residual & extra_on
    return (
        lb.join(rb, on="__rj_bucket")
        .filter(residual)
        .drop("__rj_bucket", "__rj_ms", "__rj_rms")
    )
