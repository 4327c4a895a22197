"""Declarative data-quality constraint suite (Deequ-style).

A pipeline feeding a 100 TB training run needs gate checks on every
ingested table: completeness, uniqueness, value ranges, set/pattern
compliance. This module compiles a declared list of constraints into
ONE aggregation pass over the table (one scan, one 1-row global agg —
no per-constraint jobs), then unpivots the metrics into long form and
evaluates each constraint's predicate driver-side on the single result
row.

The design mirrors the engine's rule surface (SURVEY §1.3: declarative
config compiled to a Catalyst plan): a ``Constraint`` is (metric name,
aggregation expression, pass predicate), and ``run_checks`` is the
compiler. Cross-engine determinism: fractions are one IEEE division of
exact integer counts, means are decimal-sum / count (order-insensitive),
min/max are exact — so the whole report value-hash matches a SQL oracle.

Scale notes: everything is a partial-aggregable global agg (map-side
collapse to one row per partition). ``uniqueness``/``distinctness`` use
COUNT(DISTINCT), which Expands input rows per distinct column at scale;
for sketch-sized state swap in the HLL registers from
operators/sketches.py (the ``approx_distinct_constraint`` variant).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One quality metric + its pass predicate.

    metric: unique name in the report (e.g. ``completeness(o_custkey)``)
    agg: aggregation expression producing the metric value (double)
    passes: metric value -> pass expression (evaluated in the same plan)
    """

    metric: str
    agg: Column
    passes: Callable[[Column], Column] | None = None


def _frac(num: Column, den: Column) -> Column:
    # one IEEE division of two exact longs — deterministic across engines
    return num.cast("double") / den.cast("double")


def completeness(col: str, at_least: float | None = None) -> Constraint:
    """Fraction of rows with a non-null value."""
    return Constraint(
        f"completeness({col})",
        _frac(F.count(col), F.count(F.lit(1))),
        (lambda v: v >= at_least) if at_least is not None else None,
    )


def uniqueness(col: str, exact: bool = True) -> Constraint:
    """distinct/count — 1.0 means the column is a key."""
    return Constraint(
        f"uniqueness({col})",
        _frac(F.countDistinct(col), F.count(F.lit(1))),
        (lambda v: v == 1.0) if exact else None,
    )


def distinctness(col: str, at_least: int | None = None) -> Constraint:
    """Exact distinct count (see module docstring for the sketch swap)."""
    return Constraint(
        f"distinctness({col})",
        F.countDistinct(col).cast("double"),
        (lambda v: v >= at_least) if at_least is not None else None,
    )


def min_value(col: str, at_least: float | None = None) -> Constraint:
    return Constraint(
        f"min({col})",
        F.min(col).cast("double"),
        (lambda v: v >= at_least) if at_least is not None else None,
    )


def max_value(col: str, at_most: float | None = None) -> Constraint:
    return Constraint(
        f"max({col})",
        F.max(col).cast("double"),
        (lambda v: v <= at_most) if at_most is not None else None,
    )


def mean_value(col: str, between: tuple[float, float] | None = None) -> Constraint:
    # decimal accumulation, one final division — the q25/q49 discipline
    agg = F.sum(F.col(col).cast("decimal(18,6)")).cast("double") / F.count(col)
    return Constraint(
        f"mean({col})",
        agg,
        (lambda v: (v >= between[0]) & (v <= between[1])) if between else None,
    )


def compliance(name: str, predicate: Column, at_least: float = 1.0) -> Constraint:
    """Fraction of rows satisfying an arbitrary boolean expression —
    the escape hatch for set membership, regex shape, range rules."""
    return Constraint(
        f"compliance({name})",
        _frac(
            F.sum(F.when(predicate, 1).otherwise(0)),
            F.count(F.lit(1)),
        ),
        lambda v: v >= at_least,
    )


def run_checks(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Compile all constraints into one aggregation pass and unpivot to
    (metric, value, passed) long form. ``passed`` is NULL for metrics
    declared without a threshold (profile-only)."""
    aggs = [c.agg.alias(f"_m{i}") for i, c in enumerate(constraints)]
    row = df.agg(*aggs)
    entries = []
    for i, c in enumerate(constraints):
        v = F.col(f"_m{i}")
        passed = (
            c.passes(v).cast("int") if c.passes is not None else F.lit(None).cast("int")
        )
        entries.append(
            F.struct(
                F.lit(c.metric).alias("metric"),
                v.cast("double").alias("value"),
                passed.alias("passed"),
            )
        )
    return (
        row.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.metric", "e.value", "e.passed")
    )


def benford_profile(
    df: DataFrame, value_col: str, decimal_scale: int = 2
) -> DataFrame:
    """Leading-digit distribution of a positive numeric column vs
    Benford's law — the classic fabricated-data screen (naturally
    occurring amounts follow ``P(d) = log10(1 + 1/d)``; synthetic or
    tampered ones usually don't).

    The leading digit is extracted via exact integer arithmetic, not
    ``log10``: the value is scaled to an integer at ``decimal_scale``
    (round-half-up, so 6.55 → 655 even when the double is stored as
    654.999…), then the first character of its decimal rendering —
    engine-portable where floating log/pow on boundary values is not.

    One aggregation to the 9-row digit frame; expected shares and the
    per-digit chi-square contribution ((obs − exp)² / exp, on count
    scale) are literal arithmetic on that frame. Rows with value ≤ 0
    are excluded (Benford is defined on positive magnitudes).

    Returns (digit int, n bigint, frac double, benford_p double,
    chi2_term double, all but n rounded to 6). Rows whose value rounds
    to 0 at ``decimal_scale`` are excluded with the non-positive ones —
    the digit domain is exactly 1-9.
    """
    scaled = F.round(
        F.col(value_col) * F.lit(float(10 ** decimal_scale)), 0
    ).cast("long")
    digit = F.substring(scaled.cast("string"), 1, 1).cast("int")
    counts = (
        # filter on the SCALED integer: a positive value that rounds to
        # 0 at this scale (e.g. 0.003 at scale 2) has no leading digit
        # in [1, 9] and would otherwise emit digit=0 with a division by
        # zero in the expected share
        df.filter(scaled > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    everything = Window.partitionBy()
    total = F.sum("n").over(everything)
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    expected = p * total
    return counts.select(
        "digit", "n",
        F.round(F.col("n") / total, 6).alias("frac"),
        F.round(p, 6).alias("benford_p"),
        F.round(
            (F.col("n") - expected) * (F.col("n") - expected) / expected, 6
        ).alias("chi2_term"),
    )


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    constraint: str | None = None,
) -> DataFrame:
    """Foreign-key audit: how many child rows reference a parent key
    that does not exist (the Deequ ``isContainedIn``-on-a-table check
    the one-pass constraint suite can't express — it needs a join).

    Plan shape: the parent side reduces to its DISTINCT keys (one
    aggregation that map-side collapses to key cardinality) and joins
    the child on the fk — AQE broadcasts it when dimension-sized,
    hash-joins co-partitioned otherwise. NULL fks are counted
    separately and are NOT orphans (SQL FK semantics: NULL references
    nothing). One row out.

    Returns (constraint, n_rows, n_null_fk, n_orphans, orphan_frac
    double, passed boolean) — ``orphan_frac`` over the non-null rows,
    0.0 when there are none; ``passed`` iff no orphans.
    """
    name = constraint or f"{fk_col}_references_{pk_col}"
    keys = parent.select(F.col(pk_col).alias("__pk")).distinct().withColumn(
        "__hit", F.lit(1)
    )
    joined = child.select(F.col(fk_col).alias("__fk")).join(
        keys, F.col("__fk") == F.col("__pk"), "left"
    )
    return joined.agg(
        F.lit(name).alias("constraint"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("__fk").isNull(), 1)).alias("n_null_fk"),
        F.count(
            F.when(F.col("__fk").isNotNull() & F.col("__hit").isNull(), 1)
        ).alias("n_orphans"),
    ).select(
        "constraint", "n_rows", "n_null_fk", "n_orphans",
        F.when(
            F.col("n_rows") > F.col("n_null_fk"),
            F.col("n_orphans") / (F.col("n_rows") - F.col("n_null_fk")),
        ).otherwise(F.lit(0.0)).alias("orphan_frac"),
        (F.col("n_orphans") == 0).alias("passed"),
    )


def column_profile(
    df: DataFrame, cols: list[str], top_k: int = 5
) -> DataFrame:
    """Per-column value profile: distinct count, null count, Shannon
    entropy of the value distribution, and the top-k most frequent
    values — the table-profiling report (pandas-profiling / Deequ
    ``Analyzer`` role) that drives schema review and quality-rule
    tuning.

    Plan shape: per column, one hash aggregation to the (column, value)
    count frame — at 100 TB this is the column's value cardinality, the
    same class as any GROUP BY on it — then TWO bounded follow-ons over
    that frame, both distributed: a one-row scalar aggregation (counts
    + the entropy sums) and a ``TakeOrderedAndProject`` top-k (ORDER BY
    + LIMIT — per-partition heaps, never a global sort; the previous
    single-partition ranking window was exactly the 100 TB choke this
    module exists to avoid). Columns profile independently and union;
    values render to strings so one long-form schema fits every type.

    Entropy uses the sum-decomposed form ``ln(nn) − (Σ n·ln n)/nn``
    (algebraically equal to ``−Σ p·ln p``) so it needs no per-row
    knowledge of the total — one pass, rounded to 6 (cross-engine
    float-sum-order guard). Returns one row per column: (column,
    n_rows, n_nulls, n_distinct, entropy, top_values — the top-k as
    'value:count' joined by ',', count-desc then value-asc; NULL is
    reported in n_nulls and never takes a top-k slot).
    """
    frames = []
    for c in cols:
        counts = (
            df.select(F.col(c).cast("string").alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=False)
        )
        scalars = counts.agg(
            F.lit(c).alias("column"),
            F.sum("n").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("v").isNull(), F.col("n"))), F.lit(0)
            ).alias("n_nulls"),
            F.count(F.when(F.col("v").isNotNull(), 1)).alias("n_distinct"),
            F.sum(F.when(F.col("v").isNotNull(), F.col("n"))).alias("_nn"),
            F.sum(
                F.when(
                    F.col("v").isNotNull(),
                    F.col("n") * F.log(F.col("n").cast("double")),
                )
            ).alias("_snln"),
        )
        top = (
            counts.filter(F.col("v").isNotNull())
            .orderBy(F.col("n").desc(), F.col("v").asc())
            .limit(top_k)
            .agg(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    # sort key: count desc (negated), value asc
                                    F.struct(
                                        (-F.col("n")).alias("_neg"),
                                        F.col("v").alias("v"),
                                        F.col("n").alias("n"),
                                    )
                                )
                            ),
                            lambda s_: F.concat_ws(
                                ":", s_["v"], s_["n"].cast("string")
                            ),
                        ),
                        ",",
                    ),
                    F.lit(""),
                ).alias("top_values")
            )
        )
        frames.append(
            scalars.crossJoin(F.broadcast(top)).select(
                "column", "n_rows", "n_nulls", "n_distinct",
                F.round(
                    F.coalesce(
                        F.log(F.col("_nn").cast("double"))
                        - F.col("_snln") / F.col("_nn"),
                        F.lit(0.0),
                    ),
                    6,
                ).alias("entropy"),
                "top_values",
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    edges: Sequence[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the drift monitor a training-data pipeline runs between
    yesterday's corpus and today's (or between a source slice and the
    whole): ``PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)`` over FIXED
    half-open buckets ``(−∞, e_0) [e_0, e_1) … [e_{k−1}, ∞)``. The
    conventional reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25
    shifted.

    Buckets are EXPLICIT edges, not quantiles, for two reasons: the
    cross-engine contract (percentile estimates differ between engines
    and releases; integer bucket counts over fixed edges are exact
    everywhere), and the production one — a monitor's buckets must stay
    FROZEN across runs or the metric measures its own re-bucketing.
    Empty buckets clamp both proportions to ``eps`` (the standard
    continuity correction; a bucket empty on BOTH sides contributes
    exactly 0 by the clamp's symmetry). NULLs count into no bucket and
    are reported via the ``n_null`` columns instead of silently
    vanishing into a denominator.

    Scale shape: one map-side CASE per row, two tiny hash aggregations
    (O(buckets) output), a broadcast full-outer alignment on bucket id,
    totals as one-row broadcast scalars. Returns one row per bucket:
    ``(bucket, lo, hi, n_ref, n_cur, p_ref, p_cur, psi_term)`` with
    psi_term rounded to 6 decimals (transcendental-margin rule); the
    total PSI is ``sum(psi_term)`` — left to the caller/SQL so the
    per-bucket attribution (WHICH band moved) stays visible."""
    es = [float(e) for e in edges]
    if not es or es != sorted(es) or len(set(es)) != len(es):
        raise ValueError("edges must be a non-empty strictly-increasing list")

    def bucket_expr():
        b = F.when(F.col(col) < es[0], 0)
        for i in range(1, len(es)):
            b = b.when(F.col(col) < es[i], i)
        return b.otherwise(len(es))

    def side(df: DataFrame, n_name: str) -> DataFrame:
        # ONE corpus pass per side: NULLs take the −1 sentinel bucket in
        # the same aggregation (a when-chain on a NULL comparison would
        # otherwise fall through to the last bucket); the O(buckets)
        # result is checkpointed so the alignment join, the null pull,
        # and the totals below never re-scan the corpus
        b = (
            F.when(F.col(col).isNull(), F.lit(-1))
            .otherwise(bucket_expr())
            .cast("long")
        )
        return (
            df.groupBy(b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias(n_name))
            .localCheckpoint(eager=False)
        )

    spark = ref.sparkSession
    sref, scur = side(ref, "n_ref"), side(cur, "n_cur")
    bounds = [(i, (None if i == 0 else es[i - 1]),
               (None if i == len(es) else es[i])) for i in range(len(es) + 1)]
    spine = spark.createDataFrame(bounds, "bucket long, lo double, hi double")
    nulls = F.broadcast(
        sref.filter(F.col("bucket") == -1)
        .agg(F.coalesce(F.sum("n_ref"), F.lit(0)).alias("n_null_ref"))
        .crossJoin(
            scur.filter(F.col("bucket") == -1)
            .agg(F.coalesce(F.sum("n_cur"), F.lit(0)).alias("n_null_cur"))
        )
    )
    joined = (
        spine.join(F.broadcast(sref.filter(F.col("bucket") >= 0)), "bucket", "left")
        .join(F.broadcast(scur.filter(F.col("bucket") >= 0)), "bucket", "left")
        .na.fill({"n_ref": 0, "n_cur": 0})
    )
    totals = F.broadcast(
        joined.agg(
            F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
        )
    )
    p = F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(eps))
    q = F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(eps))
    return (
        joined.crossJoin(totals)
        .crossJoin(nulls)
        .select(
            "bucket", "lo", "hi", "n_ref", "n_cur",
            F.round(p, 6).alias("p_ref"),
            F.round(q, 6).alias("p_cur"),
            F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
            "n_null_ref", "n_null_cur",
        )
        .orderBy("bucket")
    )
