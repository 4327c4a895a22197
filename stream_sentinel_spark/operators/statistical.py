"""Statistical-outlier rule → per-event trailing last-N mean/σ plan.

Semantics (StatisticalOutlierDetector.java:77-130): per key, a deque of
the last ``windowSize`` *numeric* values of ``field``. On each event:

- missing/non-numeric field → skip, window untouched (:83-86);
- if history size ≥ 2 (MIN_HISTORY_SIZE, :45,:92), compute mean and
  **population** stddev (÷N, :149-156) of the window **excluding the
  current value** (evaluate-before-insert, :122-127);
- fire iff ``abs(v − mean) > (σ == 0 ? 0 : factor·σ)`` (:94-99) — so
  after ≥2 identical values, ANY different value fires (σ=0 rule);
- then append ``v`` and trim to ``windowSize`` (:124-127).

Batch mapping: because skipped events never touch the window, first
restrict to rows with a numeric value, then a ROWS frame
``BETWEEN windowSize PRECEDING AND 1 PRECEDING`` (ending at −1 ≡
evaluate-before-insert) with ``avg``, ``stddev_pop`` (NOT the sample
``stddev`` — ÷N−1 would silently shift fire thresholds), and ``count``.
Single key-shuffle, single pass, bounded frame (windowSize ≤ ~20) — the
plan scales linearly and AQE handles key skew.

Ordering: the reference deque is arrival-ordered; we order by
``(ts, *order_cols)`` for a deterministic total order (SURVEY §7.4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_sentinel_spark.functions.alerts import to_alerts
from stream_sentinel_spark.functions.coercion import key_column, numeric_field
from stream_sentinel_spark.rules import DetectionRule

#: StatisticalOutlierDetector.java:114-116 — format locked by goldens.
DETAILS_FORMAT = "Statistical outlier: %s=%.2f (mean=%.2f, stddev=%.2f, factor=%.1f)"

#: StatisticalOutlierDetector.java:45
MIN_HISTORY_SIZE = 2

_VAL, _MEAN, _SD, _CNT = "__ss_value", "__ss_mean", "__ss_sd", "__ss_cnt"


def compile_statistical(
    df: DataFrame,
    rule: DetectionRule,
    *,
    key_field: str,
    time_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    rule_index: int = 0,
) -> DataFrame:
    event_columns = list(df.columns)
    window_size = int(rule.window_size)
    factor = float(rule.deviation_factor)

    # Missing-field events are invisible to the window (skip semantics).
    valid = df.withColumn(_VAL, numeric_field(df, rule.field)).filter(
        F.col(_VAL).isNotNull()
    )
    order = [F.unix_micros(F.col(time_col))] + [F.col(c) for c in order_cols]
    frame = (
        Window.partitionBy(key_column(valid, key_field))
        .orderBy(*order)
        .rowsBetween(-window_size, -1)
    )
    stats = (
        valid.withColumn(_MEAN, F.avg(_VAL).over(frame))
        .withColumn(_SD, F.stddev_pop(_VAL).over(frame))
        .withColumn(_CNT, F.count(_VAL).over(frame))
    )
    fire_bound = F.when(F.col(_SD) == 0.0, F.lit(0.0)).otherwise(F.lit(factor) * F.col(_SD))
    fired = stats.filter(
        (F.col(_CNT) >= MIN_HISTORY_SIZE)
        & (F.abs(F.col(_VAL) - F.col(_MEAN)) > fire_bound)
    )
    details = F.format_string(
        DETAILS_FORMAT,
        F.lit(rule.field),
        F.col(_VAL),
        F.col(_MEAN),
        F.col(_SD),
        F.lit(factor),
    )
    return to_alerts(
        fired,
        rule_name=rule.name,
        key_col=key_column(fired, key_field),
        time_col=F.col(time_col),
        details=details,
        event_columns=event_columns,
        rule_index=rule_index,
    )
