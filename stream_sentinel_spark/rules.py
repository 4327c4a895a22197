"""Detection-rule model + validation.

Parity with the reference's ``DetectionRule`` POJO and ``RulesConfig``
(core-engine/.../model/DetectionRule.java:29-118,
core-engine/.../config/RulesConfig.java:33-85): same fields, same
defaults (windowSize=10, deviationFactor=2.0), same all-errors-collected
validation with byte-identical messages.

A rule is not runtime code here — it is *compiled* into a DataFrame plan
by :mod:`stream_sentinel_spark.plans.pipeline`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

SUPPORTED_TYPES = ("rate", "threshold", "statistical")

#: Engine-extension rule types: type → all-errors validator. Populated
#: by extension modules at import (e.g. operators/cusum.py registers
#: "cusum"); the reference trio above never goes through this table, so
#: reference validation semantics — including the unknown-type error
#: message — are untouched for configs the reference would accept.
EXTENSION_VALIDATORS: dict[str, Callable[["DetectionRule"], list[str]]] = {}

# Defaults mirrored from DetectionRule.java:55,58
DEFAULT_WINDOW_SIZE = 10
DEFAULT_DEVIATION_FACTOR = 2.0


class RuleValidationError(ValueError):
    """IllegalStateException parity (DetectionRule.java:113-117)."""


@dataclass
class DetectionRule:
    """One YAML-declared detection rule (DetectionRule.java:29-58).

    type ∈ {rate, threshold, statistical}; type string is normalized to
    lower-case on assignment (DetectionRule.java:141-143).
    """

    name: str | None = None
    type: str | None = None
    key_field: str | None = None
    window_seconds: int = 0
    field: str | None = None
    threshold: float = 0.0
    window_size: int = DEFAULT_WINDOW_SIZE
    deviation_factor: float = DEFAULT_DEVIATION_FACTOR
    # Engine extensions (not in the reference YAML grammar):
    # reference value for drift detectors (cusum: s += x - target)
    target: float = 0.0
    # when set, the
    # statistical detector accumulates window sums in exact fixed-point
    # (values must have at most this many decimals) so results are
    # bit-identical across engines and summation orders — the right mode
    # for currency-like fields and for oracle-checked runs.
    decimal_scale: int | None = None

    def __post_init__(self) -> None:
        if self.type is not None:
            self.type = self.type.lower()

    # -- YAML field-name mapping (camelCase on the wire, DetectionRule.java) --
    _YAML_KEYS = {
        "name": "name",
        "type": "type",
        "keyField": "key_field",
        "windowSeconds": "window_seconds",
        "field": "field",
        "threshold": "threshold",
        "windowSize": "window_size",
        "deviationFactor": "deviation_factor",
        "target": "target",
    }

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "DetectionRule":
        """Build from a parsed YAML mapping; unknown keys are tolerated
        (Event.java:33 @JsonIgnoreProperties parity for config)."""
        kwargs: dict[str, Any] = {}
        for yaml_key, attr in cls._YAML_KEYS.items():
            if raw.get(yaml_key) is not None:
                kwargs[attr] = raw[yaml_key]
        rule = cls(**kwargs)
        # None-able numerics in YAML fall back to reference defaults
        if rule.window_size is None:
            rule.window_size = DEFAULT_WINDOW_SIZE
        if rule.deviation_factor is None:
            rule.deviation_factor = DEFAULT_DEVIATION_FACTOR
        return rule

    def errors(self) -> list[str]:
        """Collect all validation errors (DetectionRule.java:70-111)."""
        errors: list[str] = []
        if not (self.name or "").strip():
            errors.append("Rule 'name' is required")
        if not (self.type or "").strip():
            errors.append("Rule 'type' is required")
        if self.type:
            if self.type == "rate":
                if not (self.key_field or "").strip():
                    errors.append(f"Rate rule '{self.name}' requires 'keyField'")
                if self.window_seconds <= 0:
                    errors.append(f"Rate rule '{self.name}' requires 'windowSeconds' > 0")
                if self.threshold <= 0:
                    errors.append(f"Rate rule '{self.name}' requires 'threshold' > 0")
            elif self.type == "threshold":
                if not (self.field or "").strip():
                    errors.append(f"Threshold rule '{self.name}' requires 'field'")
            elif self.type == "statistical":
                if not (self.field or "").strip():
                    errors.append(f"Statistical rule '{self.name}' requires 'field'")
                if self.window_size < 2:
                    errors.append(
                        f"Statistical rule '{self.name}' requires 'windowSize' >= 2"
                    )
                if self.deviation_factor <= 0:
                    errors.append(
                        f"Statistical rule '{self.name}' requires 'deviationFactor' > 0"
                    )
            elif self.type in EXTENSION_VALIDATORS:
                errors.extend(EXTENSION_VALIDATORS[self.type](self))
            else:
                errors.append(
                    f"Unknown rule type: '{self.type}'. "
                    "Supported: rate, threshold, statistical"
                )
        return errors

    def validate(self) -> None:
        """Raise with every error joined by '; ' (DetectionRule.java:113-117)."""
        errs = self.errors()
        if errs:
            raise RuleValidationError("Invalid DetectionRule: " + "; ".join(errs))


@dataclass
class RulesConfig:
    """Top-level YAML document ``rules: [...]`` (RulesConfig.java:33-85)."""

    rules: list[DetectionRule] = field(default_factory=list)

    @classmethod
    def from_obj(cls, raw: Any) -> "RulesConfig":
        if raw is None:
            return cls(rules=[])
        if not isinstance(raw, dict):
            raise RuleValidationError(f"Rules document must be a mapping, got {type(raw).__name__}")
        entries = raw.get("rules") or []
        if not isinstance(entries, list):
            raise RuleValidationError("'rules' must be a list")
        return cls(rules=[DetectionRule.from_dict(e or {}) for e in entries])

    def validate(self) -> None:
        """All-errors-collected validation across every rule
        (RulesConfig.java:67-85)."""
        errors: list[str] = []
        for i, rule in enumerate(self.rules):
            for err in rule.errors():
                errors.append(f"rule[{i}]: {err}")
        if errors:
            raise RuleValidationError("Invalid rules configuration: " + "; ".join(errors))
