"""Rule → DataFrame-plan compilers and large-scale data operators.

Detection rules (reference parity):
- threshold  — stateless predicate (ThresholdDetector.java:46-78)
- rate       — per-event trailing time-window count (RateSpikeDetector.java:74-114)
- statistical — per-event trailing last-N mean/σ test (StatisticalOutlierDetector.java:77-130)

Training-data-pipeline extensions (designed for 100 TB): dedup,
similarity, text, multimodal.
"""

from stream_sentinel_spark.operators.registry import RULE_COMPILERS, compiler_for

__all__ = ["RULE_COMPILERS", "compiler_for"]
