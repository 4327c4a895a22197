"""As-of (most-recent-prior) join — engine extension.

Spark has no ASOF JOIN operator (DuckDB/Pandas do). The scalable
formulation is the union-and-carry trick: tag both sides, union them,
and per key in time order carry the latest right-side payload forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding frame.
One shuffle on the key, no range-join explosion, no per-row probe —
this is how you as-of join two 100 TB streams. (A broadcast range join
would need one side small; this needs neither.)

Tie semantics: at equal timestamps the right row sorts BEFORE the left
row (side tag 0 < 1), so an exactly-simultaneous right row IS visible —
matching ASOF JOIN's ``t_right <= t_left``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    right_on: str | None = None,
    left_time: str,
    right_time: str,
    right_values: Sequence[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For every left row, attach the most recent right row's values with
    ``right_time <= left_time`` for the same key (``on`` on the left,
    ``right_on`` — default ``on`` — on the right); NULLs when no prior
    right row, like ASOF LEFT JOIN.

    ``tolerance_ms`` drops matches older than the tolerance (NULLs
    instead), like pandas ``merge_asof(tolerance=...)``.
    """
    right_on = right_on or on
    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.unix_millis(F.col(left_time)).alias("__t"),
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
    )
    r = right.select(
        F.col(right_on).alias("__k"),
        F.unix_millis(F.col(right_time)).alias("__t"),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        *[F.col(c) for c in lcols],
        F.col("__t"),
        F.col(_SIDE),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
            for c in right_values
        ],
        F.last(F.when(F.col(_SIDE) == 0, F.col("__t")), ignorenulls=True)
        .over(w)
        .alias("__rt"),
    )
    out = carried.filter(F.col(_SIDE) == 1)
    if tolerance_ms is not None:
        # out-of-tolerance matches null out (pandas merge_asof semantics)
        within = F.col("__rt") >= F.col("__t") - F.lit(tolerance_ms)
        out = out.select(
            *[F.col(c) for c in lcols],
            *[
                F.when(within, F.col(f"r_{c}")).otherwise(F.lit(None)).alias(f"r_{c}")
                for c in right_values
            ],
        )
    else:
        out = out.select(
            *[F.col(c) for c in lcols],
            *[F.col(f"r_{c}") for c in right_values],
        )
    return out


def point_in_time_join(
    labels: DataFrame,
    features: Sequence[dict],
    *,
    label_time: str,
) -> DataFrame:
    """FEATURE-STORE point-in-time enrichment: attach, to every label
    row, each feature table's most recent value as of the label's
    timestamp — the join a training-set builder runs so features never
    leak the future. One :func:`asof_join` per feature table (the
    union-and-carry formulation — one key shuffle each, no range
    explosion), composed left-to-right; each feature's columns land
    namespaced as ``{name}__{col}`` so two tables can expose the same
    column name.

    ``features``: a sequence of specs, each a dict with
    ``name`` (output prefix), ``df`` (the feature table), ``on``
    (label key column), ``right_on`` (feature key, default ``on``),
    ``time`` (feature timestamp column), ``values`` (feature columns
    to attach), optional ``tolerance_ms`` (staleness bound — feature
    older than this nulls out, pandas ``merge_asof`` semantics).

    Point-in-time correctness is the asof contract: a feature row at
    exactly the label time IS visible (``t_feature <= t_label``) —
    keep the label event itself out of its own feature table (use a
    different event type or a strictly-earlier snapshot) for
    leakage-free training labels.

    Scale shape at 100 TB: each feature attach is one shuffle of
    labels ∪ that feature table on the key — never a cross product,
    never a per-row probe; K feature tables cost K sequential keyed
    shuffles (pipeline them by bucketing the label key once). This is
    the batch-backfill half of a feature store; the serving half is
    the upsert loop's snapshot (streaming/upsert.py), whose
    latest-wins merge is the degenerate as-of at t = now."""
    out = labels
    for spec in features:
        name = spec["name"]
        values = list(spec["values"])
        out = asof_join(
            out,
            spec["df"],
            on=spec["on"],
            right_on=spec.get("right_on"),
            left_time=label_time,
            right_time=spec["time"],
            right_values=values,
            tolerance_ms=spec.get("tolerance_ms"),
        )
        for c in values:
            out = out.withColumnRenamed(f"r_{c}", f"{name}__{c}")
    return out
