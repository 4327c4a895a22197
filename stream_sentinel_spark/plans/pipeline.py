"""Rule-set → alert-plan compiler (the engine's "query planner").

The reference evaluates every rule against every event in YAML order
inside one per-key process function (AnomalyProcessFunction.java:106-143,
order preserved by DetectorFactory.createAll:65-72). Here each rule
compiles to an independent DataFrame branch over the SAME source frame
and the branches are ``unionByName``-ed — rules are independent by
construction (the reference isolates a throwing detector per event,
:131-134; our isolation is compile-time validation, SURVEY §4.1).

``rule_index`` makes the per-event YAML-order emission reconstructible:
sort by ``(key, alert_ts, rule_index)`` for golden comparison.

Plan shape: each branch scans the source independently (Catalyst does
not merge them — their filters/orderings differ, so neither scan nor
exchange reuse applies), but every scan is column-pruned to the few
columns its rule needs, and the stateless branches add no shuffle at
all; the whole 3-rule plan carries exactly one key shuffle per stateful
rule (asserted in tests/test_plan_shapes.py). At 100 TB the N pruned
scans are the right trade against caching the source or forcing the
branches through one shared shuffle they can't all use. In streaming
(streaming/job.py) the stateful branches DO collapse into one keyed
processor — a single shuffle and state store for all stateful rules.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame

from stream_sentinel_spark.operators.registry import compiler_for
from stream_sentinel_spark.rules import DetectionRule


def compile_rule(
    df: DataFrame,
    rule: DetectionRule,
    *,
    key_field: str,
    time_col: str = "ts",
    order_cols: Sequence[str] = (),
    rule_index: int = 0,
) -> DataFrame:
    """Compile one validated rule into its alert frame."""
    rule.validate()
    compiler = compiler_for(rule)
    return compiler(
        df,
        rule,
        key_field=key_field,
        time_col=time_col,
        order_cols=tuple(order_cols),
        rule_index=rule_index,
    )


def compile_rules(
    df: DataFrame,
    rules: Sequence[DetectionRule],
    *,
    key_field: str,
    time_col: str = "ts",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Compile a full rule set into one union-of-branches alert plan.

    Empty rule set is fatal, as at job start (StreamSentinelJob.java:70-75).
    """
    if not rules:
        raise ValueError("No detection rules configured — refusing to start (empty rule set)")
    branches = [
        compile_rule(
            df,
            rule,
            key_field=key_field,
            time_col=time_col,
            order_cols=order_cols,
            rule_index=i,
        )
        for i, rule in enumerate(rules)
    ]
    return reduce(lambda a, b: a.unionByName(b), branches)
