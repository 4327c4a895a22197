"""Change-data-capture operators: latest-wins merge and SCD2 history.

Incremental ingestion for a training-data lake: an upstream source
emits keyed change rows (upserts and deletes, ordered by a sequence
column); the pipeline needs (a) the current snapshot — MERGE semantics
— and (b) the full slowly-changing-dimension type-2 history with
validity intervals, so any past training run can be reproduced against
the table "as of" its cut timestamp.

Both operators are pure window functions over (key, seq) — one hash
shuffle on the key, no driver work, no state: the shape that scales to
a 1000-executor backfill. Ties on the sequence column are broken by the
caller-supplied tiebreak column, so results are total-ordered and
oracle-checkable.

Engine extension (SURVEY §2.6 — the reference has no relational
surface); the streaming twin of ``merge_latest`` is the per-key
state in streaming/state.py (latest value per key under TTL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_latest(
    changes: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins MERGE: collapse a change stream to its current
    snapshot. The newest row per key (by ``seq_cols``) wins; if
    ``op_col`` is given and the newest row carries ``delete_op``, the
    key is absent from the snapshot (a delete tombstone).

    One window shuffle on the key — at scale this is the standard
    row_number-over-key compaction that AQE handles skew for.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if op_col is not None:
        latest = latest.filter(F.col(op_col) != delete_op)
    return latest


def scd2(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history with change compression:
    per key, consecutive rows whose ``attr_cols`` did not change are
    collapsed into one version; each version carries
    ``valid_from`` = its first sequence value, ``valid_to`` = the next
    version's start (NULL while current), and ``is_current``.

    Two windows over the same (key, seq) ordering — Catalyst reuses the
    partitioning, so the plan is one shuffle + two sorts (the second
    over the much smaller compressed row set).
    """
    tb = tiebreak_cols or []
    order = [F.col(seq_col), *[F.col(c) for c in tb]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        # NULL-safe inequality: a change to/from NULL is a change
        prev_changed = prev_changed | ~F.col(c).eqNullSafe(prev)
    first = F.row_number().over(w) == 1
    compressed = changes.withColumn(
        "_new_version", (first | prev_changed).cast("int")
    ).filter(F.col("_new_version") == 1)
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        compressed.withColumn("valid_from", F.col(seq_col))
        .withColumn("valid_to", F.lead(seq_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
        .select(*key_cols, *attr_cols, "valid_from", "valid_to", "is_current")
    )


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two table snapshots (the data-reconciliation /
    regression-diff tool): per key, is the row ``added`` (only in b),
    ``removed`` (only in a), ``changed`` (in both, any compare column
    differs null-safely), or ``unchanged``.

    Plan shape: ONE full-outer hash join on the key columns — the only
    formulation that scales (both sides shuffle once on the same key;
    no collect, no broadcast requirement). By default ``unchanged``
    rows are dropped BEFORE anything downstream sees them, so the
    output is bounded by the churn between snapshots, not the table
    size — diffing two 100 TB snapshots with 0.1% churn emits 0.1%.

    Returns (*key_cols, status, changed_cols) — ``changed_cols`` is the
    comma-joined sorted list of differing columns (empty for
    added/removed/unchanged).

    PRECONDITION: ``key_cols`` must be unique within each snapshot (the
    usual snapshot contract). Duplicate keys make the full-outer join
    emit one row per a×b pairing of that key — a multiplied,
    self-contradictory diff; dedup or aggregate first if keys repeat.

    NULL key values are matched null-safely (``eqNullSafe`` — still an
    equi-join key for Spark, so the single-shuffle hash-join shape is
    unchanged): a row whose key contains NULL and exists in both
    snapshots diffs as one row, instead of surfacing twice as a
    contradictory added+removed pair.
    """
    pre_a = a.select(
        *[F.col(c).alias(f"__ka_{c}") for c in key_cols],
        *[F.col(c).alias(f"__a_{c}") for c in compare_cols],
        F.lit(1).alias("__in_a"),
    )
    pre_b = b.select(
        *[F.col(c).alias(f"__kb_{c}") for c in key_cols],
        *[F.col(c).alias(f"__b_{c}") for c in compare_cols],
        F.lit(1).alias("__in_b"),
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__ka_{k}").eqNullSafe(F.col(f"__kb_{k}"))
        cond = eq if cond is None else (cond & eq)
    joined = pre_a.join(pre_b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__ka_{k}"), F.col(f"__kb_{k}")).alias(k)
            for k in key_cols
        ],
        *[F.col(f"__a_{c}") for c in compare_cols],
        *[F.col(f"__b_{c}") for c in compare_cols],
        "__in_a",
        "__in_b",
    )
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}")), F.lit(c)
                )
                for c in sorted(compare_cols)
            ]
        )
    )
    status = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(
        *key_cols,
        status.alias("status"),
        F.when(
            status == "changed", F.array_join(diffs, ",")
        ).otherwise(F.lit("")).alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
