"""CUSUM drift rule → per-key prefix-sum plan (engine extension).

An engine-native detector type beyond the reference's trio
(DetectorFactory.java:39-52 covers threshold/rate/statistical): Page's
one-sided CUSUM accumulates small persistent shifts that never trip a
per-event threshold and wash out of a short statistical window — the
canonical drift detector. Registered through the same extension point a
user of the reference would implement ``AnomalyDetector`` for
(README.md:299-328 → :func:`~stream_sentinel_spark.operators.registry
.register`), with a streaming twin in ``streaming/state.py`` whose
state is ONE integer per key (the smallest state of any stateful rule).

Semantics (both engines, identical by construction):

- per key, in ``(ts, *order_cols)`` order: ``s_i = max(0, s_{i-1} +
  (x_i − target))``; fire iff ``s_i > threshold`` (strict);
- missing/non-numeric field → skip, state untouched (the same skip rule
  as the statistical detector);
- all arithmetic in integers scaled by ``10^decimal_scale`` (values
  quantized on entry) — exact, order-stable, and identical between the
  batch closed form and the streaming recursion.

Batch mapping: the recursion's closed form is ``s_i = r_i −
min(0, r_1..r_i)`` over prefix sums ``r_i = Σ(x − target)`` — two
CHAINED window aggregates over one key partitioning (one shuffle, no
UDF, no iteration); see operators/analytics.py:cusum for the
data-plane variant and its oracle (x58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_sentinel_spark.functions.alerts import to_alerts
from stream_sentinel_spark.functions.coercion import key_column, numeric_field
from stream_sentinel_spark.rules import DetectionRule

#: extension format (no reference golden to match; %.2f everywhere so
#: the streaming twin's Java-style rendering agrees bit-for-bit)
DETAILS_FORMAT = "CUSUM drift: %s=%.2f (cusum=%.2f, target=%.2f, threshold=%.2f)"

DEFAULT_DECIMAL_SCALE = 2

_VAL, _S = "__ss_value", "__ss_cusum"


def validate_cusum(rule: DetectionRule) -> list[str]:
    """All-errors-collected validation, same contract as
    DetectionRule.errors() gives the built-in types."""
    errors: list[str] = []
    if not (rule.field or "").strip():
        errors.append(f"Cusum rule '{rule.name}' requires 'field'")
    if rule.threshold <= 0:
        errors.append(f"Cusum rule '{rule.name}' requires 'threshold' > 0")
    return errors


def cusum_scale(rule: DetectionRule) -> int:
    return (
        DEFAULT_DECIMAL_SCALE
        if rule.decimal_scale is None
        else int(rule.decimal_scale)
    )


def compile_cusum(
    df: DataFrame,
    rule: DetectionRule,
    *,
    key_field: str,
    time_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    rule_index: int = 0,
) -> DataFrame:
    event_columns = list(df.columns)
    scale = cusum_scale(rule)
    p = 10**scale
    target_c = int(round(float(rule.target) * p))
    threshold_c = int(round(float(rule.threshold) * p))

    # skip semantics: non-numeric rows are invisible to the recursion
    valid = df.withColumn(_VAL, numeric_field(df, rule.field)).filter(
        F.col(_VAL).isNotNull()
    )
    order = [F.unix_micros(F.col(time_col))] + [F.col(c) for c in order_cols]
    run = (
        Window.partitionBy(key_column(valid, key_field))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # same quantization construction as the statistical detector's
    # fixed-point path — streaming/state.py:_cents mirrors exactly this
    cents = (F.col(_VAL).cast(f"decimal(18,{scale})") * p).cast("long")
    r = F.sum(cents - F.lit(target_c)).over(run)
    staged = valid.withColumn("__ss_r", r)
    low = F.least(F.min("__ss_r").over(run), F.lit(0).cast("long"))
    staged = staged.withColumn(_S, F.col("__ss_r") - low)

    fired = staged.filter(F.col(_S) > F.lit(threshold_c))
    details = F.format_string(
        DETAILS_FORMAT,
        F.lit(rule.field),
        F.col(_VAL),
        F.col(_S).cast("double") / F.lit(float(p)),
        F.lit(float(rule.target)),
        F.lit(float(rule.threshold)),
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


# extension registration: importing this module (operators/registry.py
# does, eagerly) makes "cusum" a first-class rule type — YAML-loadable,
# validated, compilable, streamable.
from stream_sentinel_spark import rules as _rules  # noqa: E402

_rules.EXTENSION_VALIDATORS["cusum"] = validate_cusum
