"""Rate-spike rule → per-event trailing time-window count plan.

Semantics (RateSpikeDetector.java:74-114): per key, a deque of event
timestamps in epoch millis. On each event at time ``now``:

1. evict timestamps ``< now − windowSeconds*1000`` — strict ``<``, so an
   event exactly on the boundary is KEPT (:85-87);
2. append ``now`` (:90);
3. fire iff ``count > threshold`` — strict ``>`` (:94), and it fires on
   EVERY event while over threshold (per-event, not per-window).

Batch mapping: that deque is exactly a RANGE window frame over epoch
millis — ``COUNT(*) OVER (PARTITION BY key ORDER BY ts_ms RANGE BETWEEN
windowSeconds*1000 PRECEDING AND CURRENT ROW)``; the frame's inclusive
lower bound reproduces the strict-< evict (boundary kept), and CURRENT
ROW includes the just-appended event. One hash shuffle on the key —
the same single network shuffle the reference's keyBy does
(StreamSentinelJob.java:121-124). Scale note: state per key is bounded
by the window duration; skewed keys are AQE-handled and the window is a
single pass (no self-join).

Time axis: the event's own ``ts`` column (deterministic, oracle-checkable)
rather than the reference's ingestion wall clock — the one documented
semantic divergence (SURVEY §7.4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stream_sentinel_spark.functions.alerts import to_alerts
from stream_sentinel_spark.functions.coercion import key_column
from stream_sentinel_spark.rules import DetectionRule

#: RateSpikeDetector.java:106-108 — format locked by goldens.
DETAILS_FORMAT = "Rate spike: %d events in %d seconds (threshold: %.0f)"

_CNT = "__ss_rate_count"


def compile_rate(
    df: DataFrame,
    rule: DetectionRule,
    *,
    key_field: str,
    time_col: str = "ts",
    order_cols: tuple[str, ...] = (),
    rule_index: int = 0,
) -> DataFrame:
    event_columns = list(df.columns)
    window_ms = int(rule.window_seconds) * 1000
    ts_ms = F.unix_millis(F.col(time_col))
    frame = (
        Window.partitionBy(key_column(df, key_field))
        .orderBy(ts_ms)
        .rangeBetween(-window_ms, Window.currentRow)
    )
    counted = df.withColumn(_CNT, F.count(F.lit(1)).over(frame))
    fired = counted.filter(F.col(_CNT) > F.lit(float(rule.threshold)))
    details = F.format_string(
        DETAILS_FORMAT,
        F.col(_CNT),
        F.lit(int(rule.window_seconds)),
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
