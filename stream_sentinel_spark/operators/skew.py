"""Skew mitigation: salted aggregation and salted broadcast-replicated
joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles most
skew at runtime by splitting oversized partitions, but two shapes still
need explicit salting at 100 TB:

- a grouped aggregation where ONE key holds a large share of all rows
  (a hot user, an empty-string key, a null sentinel): every row of the
  hot key lands on one reducer regardless of AQE, because aggregation
  cannot split a key across partitions. Two-phase salted aggregation
  can — phase 1 aggregates (key, salt) sub-groups, phase 2 merges the
  ≤ ``salt`` partials per key.
- a join whose build side is small enough to replicate but whose probe
  side hashes hot: replicating the build side per salt turns one hot
  partition into ``salt`` even ones.

Only ALGEBRAIC aggregates (sum/count/min/max — merge of partials is
exact and order-insensitive) are supported in the salted aggregate;
averages must be derived as sum/count by the caller, which also keeps
the arithmetic bit-stable vs an unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__ss_salt"

#: phase-1 partial → phase-2 merge for the supported algebraic aggregates
_MERGES = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase grouped aggregation that splits every key across
    ``salt`` reducers.

    ``aggs`` maps output column → (function, input column) with function
    in {sum, count, min, max}.

    The salt must be DETERMINISTIC per row content: a random or
    row-identity salt (rand(), monotonically_increasing_id,
    spark_partition_id) changes on task retry and breaks exactly-once
    semantics. Used here: xxhash64 over the key columns AND the
    aggregated input columns, mod ``salt`` — stable across retries and
    uniform enough to split hot keys whose aggregated values vary. Rows
    of a hot key with identical content collapse to one salt bucket,
    which is still correct (just less spread); the worst case equals
    the unsalted plan.

    Exactness: partial sums of decimals/longs merge associatively;
    count partials merge by summing. Result is bit-identical to the
    unsalted aggregate for integer/decimal inputs (oracle-checked in
    the corpus, x21)."""
    for fn, _ in aggs.values():
        if fn not in _MERGES:
            raise ValueError(
                f"salted_aggregate supports {sorted(_MERGES)}, got {fn!r}"
            )
    hash_inputs = [F.col(k) for k in keys] + [
        F.col(c) for _, c in aggs.values() if c != "*"
    ]
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*hash_inputs), F.lit(salt)).cast("int")
    )
    phase1 = salted.groupBy(*keys, _SALT).agg(
        *[
            (
                F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(F.col(col))
            ).alias(out)
            for out, (fn, col) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[
            _MERGES[fn](F.col(out)).alias(out)
            for out, (fn, _) in aggs.items()
        ]
    )
    return phase2


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the probe side's hot keys are spread over
    ``salt`` partitions by replicating the (small) build side once per
    salt value.

    probe rows get a deterministic content-hash salt; build rows are
    exploded ``salt``× so every (key, salt) probe partition finds its
    build rows locally. Build-side replication costs ``salt ×
    |build|`` — use only when the build side is dimension-sized (the
    same regime where a broadcast join applies, but salting also fixes
    the case where the JOIN OUTPUT of a hot key overwhelms one task
    downstream)."""
    probe_cols = [c for c in probe.columns]
    p = probe.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in probe_cols]), F.lit(salt)).cast("int"),
    )
    b = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return p.join(b, [*on, _SALT], how).drop(_SALT)
