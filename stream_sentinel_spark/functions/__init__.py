"""Scalar semantics: field access/coercion (Event.java parity) and alert
construction/serialization (Alert.java / AlertSerializationSchema parity)."""

from stream_sentinel_spark.functions.coercion import (
    field_column,
    numeric_field,
    string_field,
    key_column,
)
from stream_sentinel_spark.functions.alerts import (
    ALERT_FIELDS,
    to_alerts,
    serialize_alerts,
)

__all__ = [
    "field_column",
    "numeric_field",
    "string_field",
    "key_column",
    "ALERT_FIELDS",
    "to_alerts",
    "serialize_alerts",
]
