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

    # ALL frame aggregates go in ONE select: each chained withColumn
    # makes its own projection layer, and ExtractWindowExpressions then
    # plans one Window node (with its own Exchange) per layer — measured
    # as 5 back-to-back shuffles for this operator before the rewrite.
    # A single projection → a single Window node → a single shuffle.
    if rule.decimal_scale is None:
        # Native float path: Welford-style built-ins, fastest, semantics
        # match the reference's double arithmetic to float precision.
        stats = valid.select(
            "*",
            F.avg(_VAL).over(frame).alias(_MEAN),
            F.stddev_pop(_VAL).over(frame).alias(_SD),
            F.count(_VAL).over(frame).alias(_CNT),
        )
        mean_fmt = F.col(_MEAN)
    else:
        # Exact fixed-point path: sums of scaled integers are exact and
        # order-insensitive, so mean/σ (and their %.2f rendering) are
        # bit-identical across engines and partitionings. Requires field
        # values to carry at most `decimal_scale` decimals.
        p = 10 ** int(rule.decimal_scale)
        cents = (
            (F.col(_VAL).cast(f"decimal(18,{rule.decimal_scale})") * p)
            .cast("long")
        )
        raw = valid.select(
            "*",
            F.sum(cents).over(frame).alias("__ss_s"),
            F.sum(cents * cents).over(frame).alias("__ss_ssq"),
            F.count(cents).over(frame).alias(_CNT),
        )
        s_cents, sumsq_cents, cnt = F.col("__ss_s"), F.col("__ss_ssq"), F.col(_CNT)
        mean_true = (s_cents.cast("double") / float(p)) / cnt
        # round-half-up of (s_cents / cnt) via integer-exact floor;
        # denominators ≤ 2·windowSize keep the double division exact
        # enough that floor can never straddle an integer boundary
        mean_r = F.floor((2 * s_cents + cnt) / (2 * cnt))
        variance = (sumsq_cents.cast("double") / float(p * p)) / cnt - (
            mean_true * mean_true
        )
        sd = F.sqrt(F.greatest(variance, F.lit(0.0)))
        stats = raw.select(
            "*",
            mean_true.alias(_MEAN),
            sd.alias(_SD),
            (mean_r.cast("double") / float(p)).alias("__ss_mean_fmt"),
            # pre-round σ for rendering: with 2-row windows σ is often an
            # exact half-cent (|a−b|/2), where Java's %.2f (shortest-repr
            # HALF_UP) and C's printf (exact-expansion half-even) disagree;
            # explicit floor(σ·p + 0.5) is engine-independent
            (F.floor(sd * p + F.lit(0.5)).cast("double") / float(p)).alias("__ss_sd_fmt"),
        )
        mean_fmt = F.col("__ss_mean_fmt")

    fire_bound = F.when(F.col(_SD) == 0.0, F.lit(0.0)).otherwise(F.lit(factor) * F.col(_SD))
    fired = stats.filter(
        (F.col(_CNT) >= MIN_HISTORY_SIZE)
        & (F.abs(F.col(_VAL) - F.col(_MEAN)) > fire_bound)
    )
    sd_fmt = F.col(_SD) if rule.decimal_scale is None else F.col("__ss_sd_fmt")
    details = F.format_string(
        DETAILS_FORMAT,
        F.lit(rule.field),
        F.col(_VAL),
        mean_fmt,
        sd_fmt,
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
