"""Rule-type → compiler registry.

DetectorFactory parity (core-engine/.../detection/DetectorFactory.java:39-52):
a plain dict mirroring the factory switch; unknown type raises with the
reference's message (DetectorFactory.java:48-51). The extension point —
the reference's ``AnomalyDetector`` interface + factory case
(README.md:299-328) — is :func:`register`: a compiler is any callable
``(df, rule, *, key_field, time_col, order_cols, rule_index) -> DataFrame``
returning the canonical alert frame.
"""

from __future__ import annotations

from collections.abc import Callable


from pyspark.sql import DataFrame

from stream_sentinel_spark.operators.cusum import compile_cusum
from stream_sentinel_spark.operators.rate import compile_rate
from stream_sentinel_spark.operators.statistical import compile_statistical
from stream_sentinel_spark.operators.threshold import compile_threshold
from stream_sentinel_spark.rules import DetectionRule

RuleCompiler = Callable[..., DataFrame]

RULE_COMPILERS: dict[str, RuleCompiler] = {
    "threshold": compile_threshold,
    "rate": compile_rate,
    "statistical": compile_statistical,
    # engine extension (validated via rules.EXTENSION_VALIDATORS; the
    # unknown-type error below keeps the reference's message for types
    # neither the reference nor an extension provides)
    "cusum": compile_cusum,
}


def compiler_for(rule: DetectionRule) -> RuleCompiler:
    rule_type = (rule.type or "").strip().lower()
    compiler = RULE_COMPILERS.get(rule_type)
    if compiler is None:
        raise ValueError(
            f"Unknown rule type: '{rule.type}'. Supported: rate, threshold, statistical"
        )
    return compiler


def register(rule_type: str, compiler: RuleCompiler) -> None:
    """Register a custom rule compiler (AnomalyDetector extension parity)."""
    RULE_COMPILERS[rule_type.strip().lower()] = compiler
