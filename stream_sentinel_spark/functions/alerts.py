"""Alert construction + wire serialization.

Alert shape parity with core-engine/.../model/Alert.java:26-62 —
``ruleName`` (required), ``key``, ``timestamp``, ``details``,
``originalEvent`` (top-level map copy of the triggering event) — plus a
``rule_index`` column so multi-rule output is deterministically ordered
the way the reference's per-event rule loop is
(AnomalyProcessFunction.java:120-135 follows YAML order; SURVEY §3.2).

The alert ``key`` is ALWAYS the stream key — the reference overwrites
whatever key a detector set with ``ctx.getCurrentKey()``
(AnomalyProcessFunction.java:124-127).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Canonical alert column order.
ALERT_FIELDS = ("rule_name", "key", "alert_ts", "details", "original_event", "rule_index")


def original_event_map(columns: Iterable[str]) -> Column:
    """Defensive stringified copy of the triggering event's top-level
    fields (Alert.java:43,59-61 — map copy; values stringified per
    Event toString semantics)."""
    pairs: list[Column] = []
    for c in columns:
        pairs.append(F.lit(c))
        pairs.append(F.col(c).cast("string"))
    return F.map_from_arrays(
        F.array(*pairs[0::2]), F.array(*pairs[1::2])
    )


def to_alerts(
    fired: DataFrame,
    *,
    rule_name: str,
    key_col: Column,
    time_col: Column,
    details: Column,
    event_columns: Iterable[str],
    rule_index: int = 0,
) -> DataFrame:
    """P5 — project fired events into the canonical alert frame."""
    return fired.select(
        F.lit(rule_name).alias("rule_name"),
        key_col.cast("string").alias("key"),
        time_col.alias("alert_ts"),
        details.alias("details"),
        original_event_map(event_columns).alias("original_event"),
        F.lit(rule_index).alias("rule_index"),
    )


def serialize_alerts(alerts: DataFrame) -> DataFrame:
    """S4 — alert rows → single JSON string column ``value`` for the wire.

    Timestamp rendered ISO-8601 with UTC offset
    (AlertSerializationSchema.java:36 registers JavaTimeModule →
    ``Instant`` as ISO-8601). ``to_json`` never throws per-row; the
    reference's serialize-failure → empty-bytes path
    (AlertSerializationSchema.java:26-29) has no analogue because column
    serialization cannot fail row-wise.
    """
    return alerts.select(
        F.to_json(
            F.struct(
                F.col("rule_name").alias("ruleName"),
                F.col("key"),
                F.date_format(F.col("alert_ts"), "yyyy-MM-dd'T'HH:mm:ssXXX").alias(
                    "timestamp"
                ),
                F.col("details"),
                F.col("original_event").alias("originalEvent"),
            )
        ).alias("value")
    )
