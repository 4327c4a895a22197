from stream_sentinel_spark.plans.pipeline import compile_rule, compile_rules

__all__ = ["compile_rule", "compile_rules"]
