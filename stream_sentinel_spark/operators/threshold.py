"""Threshold rule → stateless filter plan.

Semantics (ThresholdDetector.java:46-78):
- fire iff numeric ``field`` is **strictly greater** than ``threshold``
  (strict ``>`` at :59; exact equality does NOT fire — locked by
  ThresholdDetectorTest.java:52-59);
- missing or non-numeric field → skip silently (:52-55), which the
  double cast's NULL reproduces (NULL > x is NULL → filtered out);
- string-encoded numbers fire (ThresholdDetectorTest.java:70-79) — the
  cast parses them.

Compiles to ``filter(cast(field as double) > lit(threshold))`` — a pure
Catalyst predicate: pushed down to the parquet scan, inside whole-stage
codegen, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_sentinel_spark.functions.alerts import to_alerts
from stream_sentinel_spark.functions.coercion import key_column, numeric_field
from stream_sentinel_spark.rules import DetectionRule

#: ThresholdDetector.java:71-72 — format locked by goldens.
DETAILS_FORMAT = "Threshold exceeded: %s=%.2f (threshold: %.2f)"


def compile_threshold(
    df: DataFrame,
    rule: DetectionRule,
    *,
    key_field: str,
    time_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    rule_index: int = 0,
) -> DataFrame:
    event_columns = list(df.columns)
    value = numeric_field(df, rule.field)
    threshold = float(rule.threshold)
    fired = df.filter(value > F.lit(threshold))
    details = F.format_string(
        DETAILS_FORMAT, F.lit(rule.field), numeric_field(fired, rule.field), F.lit(threshold)
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
