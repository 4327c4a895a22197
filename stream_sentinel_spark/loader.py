"""YAML rules loading.

Parity with ``RulesLoader`` (core-engine/.../config/RulesLoader.java:63-136):
resolution order env ``RULES_CONFIG_PATH`` → packaged default; duplicate
YAML keys rejected; empty document tolerated by the loader (empty rule
list) but fatal at job start (StreamSentinelJob.java:70-75 — enforced by
the streaming job entry point, not here).

Config parsing is driver-side, single-process — plain PyYAML, not a data
plane concern.
"""

from __future__ import annotations

import os

import yaml

from stream_sentinel_spark.rules import DetectionRule, RulesConfig, RuleValidationError


class _StrictLoader(yaml.SafeLoader):
    """SafeLoader that rejects duplicate mapping keys
    (RulesLoader.java:121-122 LoaderOptions parity)."""


def _strict_mapping(loader: _StrictLoader, node: yaml.MappingNode, deep: bool = False):
    seen = set()
    for key_node, _ in node.value:
        key = loader.construct_object(key_node, deep=deep)
        if key in seen:
            raise RuleValidationError(f"Duplicate key in rules YAML: {key!r}")
        seen.add(key)
    return yaml.SafeLoader.construct_mapping(loader, node, deep=deep)


_StrictLoader.add_constructor(
    yaml.resolver.BaseResolver.DEFAULT_MAPPING_TAG, _strict_mapping
)

DEFAULT_RULES_YAML = """\
# Default rule set, mirroring the reference's config/rules.yml:15-35.
rules:
  - name: high_rate
    type: rate
    keyField: userId
    windowSeconds: 10
    threshold: 5
  - name: high_amount
    type: threshold
    field: amount
    threshold: 10000
  - name: unusual_amount
    type: statistical
    field: amount
    windowSize: 20
    deviationFactor: 2.5
    threshold: 0
"""


def loads_rules(text: str, validate: bool = True) -> list[DetectionRule]:
    """Parse a YAML string into validated rules (RulesLoader.java:120-136)."""
    raw = yaml.load(text, Loader=_StrictLoader)
    config = RulesConfig.from_obj(raw)
    if validate:
        config.validate()
    return config.rules


def load_rules(path: str | None = None, validate: bool = True) -> list[DetectionRule]:
    """Load rules from ``path``, else env ``RULES_CONFIG_PATH``, else the
    packaged default set (RulesLoader.java:63-71 resolution order)."""
    resolved = path or os.environ.get("RULES_CONFIG_PATH", "")
    if resolved:
        if not os.path.exists(resolved):
            raise FileNotFoundError(f"Rules config not found: {resolved}")
        with open(resolved, "r", encoding="utf-8") as fh:
            return loads_rules(fh.read(), validate=validate)
    return loads_rules(DEFAULT_RULES_YAML, validate=validate)
