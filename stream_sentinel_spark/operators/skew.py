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

from pyspark.sql import Column, DataFrame, Window
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


def skew_report(df: DataFrame, key_col: str, percentile: float = 0.99) -> DataFrame:
    """One-row distribution report for a prospective shuffle key: key
    cardinality, row count, max/mean bucket size, the exact
    nearest-rank percentile bucket size, and the skew ratio
    (max / mean) — the number that decides whether a join or
    aggregation on this key needs salting (``salted_aggregate`` /
    ``salted_join``) before it runs.

    Plan shape: one hash aggregation on the key (the same exchange the
    real query would pay), then ranking over the AGGREGATED frame —
    |keys| rows, not |df| — and a final one-row collapse. The ranking
    window is deliberately unpartitioned: it sees only the per-key
    count frame, and the exact nearest-rank percentile is the point of
    a diagnosis run; the always-on monitoring variant is
    ``percentile_approx`` over the same counts (no global sort).

    mean/skew are single IEEE divisions of exact integers — engine-
    bit-identical; no rounding needed.
    """
    if not 0.0 < percentile <= 1.0:
        raise ValueError(f"percentile must be in (0, 1], got {percentile}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy(F.col("n").asc(), F.col("key").asc())
    everything = Window.partitionBy()
    ranked = counts.select(
        "n",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(everything).alias("nk"),
    )
    return (
        ranked.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_n"),
            F.max(
                F.when(
                    F.col("rk") == F.ceil(F.lit(percentile) * F.col("nk")),
                    F.col("n"),
                )
            ).alias("p_n"),
        )
        .select(
            "n_keys", "n_rows", "max_n", "p_n",
            (F.col("n_rows") / F.col("n_keys")).alias("mean_n"),
            (F.col("max_n") * F.col("n_keys") / F.col("n_rows")).alias("skew_ratio"),
        )
    )


def join_size_probe(
    left: DataFrame, right: DataFrame, on: list[str]
) -> DataFrame:
    """Exact output size of ``left ⋈ right ON on`` — WITHOUT running the
    join: aggregate each side to per-key counts and sum the products.
    The answer a cost-based optimizer estimates from sketches, computed
    exactly for two aggregations' cost — the pre-flight check before
    committing a cluster to a pair join that might explode (the
    ``join_rows`` / ``max_key_rows`` pair tells you both the total and
    whether ONE hot key dominates it — the x21/salting decision).

    Works for self-joins (pass the same frame twice): ``join_rows`` is
    then Σ n_k², the size of the pair-candidate blow-up the dedup
    operators guard against.

    Plan: two key aggregations (the only corpus-sized work), an inner
    join of the two |keys|-sized count frames, one-row collapse. All
    outputs are exact integers.

    Returns one row: (left_rows, right_rows, left_keys, right_keys,
    matching_keys, join_rows, max_key_rows — all bigint).
    """
    # each side's count frame is consumed twice (the match join + its
    # own totals) and both sides coincide for a self-join probe — pin
    # the |keys|-sized frames so the corpus is aggregated once per
    # DISTINCT side, not once per consumer
    lc = (
        left.groupBy(*[F.col(c) for c in on])
        .agg(F.count(F.lit(1)).alias("_nl"))
        .localCheckpoint(eager=False)
    )
    rc = (
        lc.withColumnRenamed("_nl", "_nr")
        if right is left
        else right.groupBy(*[F.col(c) for c in on])
        .agg(F.count(F.lit(1)).alias("_nr"))
        .localCheckpoint(eager=False)
    )
    matched = lc.join(rc, on).select(
        (F.col("_nl") * F.col("_nr")).alias("_prod")
    )
    l_tot = lc.agg(
        F.sum("_nl").alias("left_rows"), F.count(F.lit(1)).alias("left_keys")
    )
    r_tot = rc.agg(
        F.sum("_nr").alias("right_rows"), F.count(F.lit(1)).alias("right_keys")
    )
    m_tot = matched.agg(
        F.count(F.lit(1)).alias("matching_keys"),
        F.coalesce(F.sum("_prod"), F.lit(0)).alias("join_rows"),
        F.coalesce(F.max("_prod"), F.lit(0)).alias("max_key_rows"),
    )
    return l_tot.crossJoin(r_tot).crossJoin(m_tot)
