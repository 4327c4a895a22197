"""Field access and coercion — Event.java parity, columnar.

The reference's events are schema-free JSON maps; field access is
``getField`` / ``getNumericField`` / ``getStringField``
(core-engine/.../model/Event.java:86-125) with the load-bearing rule
that *absent or non-numeric* yields empty (never zero/crash)
(Event.java:101-114; detectors skip those events).

Columnar mapping: a typed column when the schema has it, else JSON
extraction from the open ``props`` column. ``cast("double")`` of a
non-numeric string is NULL in Spark — exactly the ``Optional.empty()``
skip semantics. All of this stays inside Catalyst/codegen (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Name of the open JSON payload column in the driver's events table.
PROPS_COLUMN = "props"


def field_column(df: DataFrame, name: str, props_col: str = PROPS_COLUMN) -> Column:
    """P1 — top-level field projection (Event.java:86-88).

    Resolution: typed column if present, else ``$.name`` from the JSON
    ``props`` column, else NULL (field absent). ``get_json_object`` on
    malformed JSON yields NULL — matching the drop-never-crash stance
    (EventDeserializationSchema.java:38-41).
    """
    if name in df.columns:
        return F.col(name)
    if props_col in df.columns:
        return F.get_json_object(F.col(props_col), f"$.{name}")
    return F.lit(None)


def numeric_field(df: DataFrame, name: str, props_col: str = PROPS_COLUMN) -> Column:
    """P2 — numeric coercion (Event.java:101-114).

    Any Number or numeric-looking string → double; absent/non-numeric →
    NULL (≡ Optional.empty(); absent ≠ zero is load-bearing:
    ThresholdDetector.java:52-55). ``try_cast`` (not ``cast``) because
    ANSI mode — Spark 4's default — makes a plain cast of a malformed
    string throw, while the reference silently skips.
    """
    return field_column(df, name, props_col).try_cast("double")


def string_field(df: DataFrame, name: str, props_col: str = PROPS_COLUMN) -> Column:
    """P3 — string coercion via toString of any value (Event.java:122-125)."""
    return field_column(df, name, props_col).cast("string")


def key_column(df: DataFrame, key_field: str, props_col: str = PROPS_COLUMN) -> Column:
    """G1 — the stream partitioning key: string form of the job-level key
    field, ``"__unknown__"`` when absent
    (StreamSentinelJob.java:121-124)."""
    return F.coalesce(
        string_field(df, key_field, props_col), F.lit("__unknown__")
    )
