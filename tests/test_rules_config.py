"""Ports of DetectorFactoryTest (4) + RulesLoaderTest (2) + config
validation — no Spark session needed.

Reference: core-engine/src/test/.../DetectorFactoryTest.java:14-47,
RulesLoaderTest.java:14-33, test-rules.yml:1-12, JobConfig.java:244-264.
"""

from __future__ import annotations

import pytest

from stream_sentinel_spark.config import EngineConfig
from stream_sentinel_spark.loader import loads_rules, load_rules
from stream_sentinel_spark.operators.registry import compiler_for
from stream_sentinel_spark.operators.rate import compile_rate
from stream_sentinel_spark.operators.statistical import compile_statistical
from stream_sentinel_spark.operators.threshold import compile_threshold
from stream_sentinel_spark.rules import DetectionRule, RuleValidationError

TEST_RULES_YAML = """\
rules:
  - name: test_rate
    type: rate
    keyField: userId
    windowSeconds: 5
    threshold: 3
  - name: test_threshold
    type: threshold
    field: amount
    threshold: 500
"""


# --- DetectorFactoryTest ports -------------------------------------------

def test_factory_maps_rate():
    rule = DetectionRule(name="r", type="rate", key_field="userId", window_seconds=5, threshold=3)
    assert compiler_for(rule) is compile_rate


def test_factory_maps_threshold():
    rule = DetectionRule(name="t", type="threshold", field="amount", threshold=500)
    assert compiler_for(rule) is compile_threshold


def test_factory_maps_statistical():
    rule = DetectionRule(name="s", type="statistical", field="amount", window_size=5)
    assert compiler_for(rule) is compile_statistical


def test_factory_unknown_type_raises():
    rule = DetectionRule(name="x", type="bogus")
    with pytest.raises(ValueError, match="Unknown rule type"):
        compiler_for(rule)


def test_factory_type_case_insensitive():
    # DetectionRule.java:141-143 lower-cases type in the setter.
    rule = DetectionRule(name="t", type="THRESHOLD", field="amount", threshold=1)
    assert compiler_for(rule) is compile_threshold


# --- RulesLoaderTest ports ------------------------------------------------

def test_load_two_rules_from_yaml():
    rules = loads_rules(TEST_RULES_YAML)
    assert [r.name for r in rules] == ["test_rate", "test_threshold"]
    assert rules[0].type == "rate"
    assert rules[0].window_seconds == 5
    assert rules[0].threshold == 3
    assert rules[1].field == "amount"


def test_load_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_rules(str(tmp_path / "nope.yml"))


def test_duplicate_yaml_keys_rejected():
    # RulesLoader.java:121-122
    bad = "rules:\n  - name: a\n    name: b\n    type: threshold\n    field: x\n"
    with pytest.raises(RuleValidationError, match="Duplicate key"):
        loads_rules(bad)


def test_empty_document_tolerated_by_loader():
    # RulesLoader.java:126-128
    assert loads_rules("") == []


def test_defaults_applied():
    # DetectionRule.java:55,58 defaults: windowSize=10, deviationFactor=2.0
    rules = loads_rules(
        "rules:\n  - name: s\n    type: statistical\n    field: v\n"
    )
    assert rules[0].window_size == 10
    assert rules[0].deviation_factor == 2.0


# --- DetectionRule.validate ports ----------------------------------------

@pytest.mark.parametrize(
    "rule, fragment",
    [
        (DetectionRule(name="r", type="rate"), "requires 'keyField'"),
        (DetectionRule(name="r", type="rate", key_field="u"), "requires 'windowSeconds' > 0"),
        (DetectionRule(name="r", type="rate", key_field="u", window_seconds=5), "requires 'threshold' > 0"),
        (DetectionRule(name="t", type="threshold"), "requires 'field'"),
        (DetectionRule(name="s", type="statistical"), "requires 'field'"),
        (DetectionRule(name="s", type="statistical", field="v", window_size=1), "requires 'windowSize' >= 2"),
        (DetectionRule(name="s", type="statistical", field="v", deviation_factor=0), "requires 'deviationFactor' > 0"),
        (DetectionRule(type="threshold", field="v"), "Rule 'name' is required"),
        (DetectionRule(name="x"), "Rule 'type' is required"),
        (DetectionRule(name="x", type="weird"), "Unknown rule type"),
    ],
)
def test_rule_validation_errors(rule, fragment):
    with pytest.raises(RuleValidationError, match="Invalid DetectionRule"):
        rule.validate()
    assert any(fragment in e for e in rule.errors())


# --- EngineConfig ---------------------------------------------------------

def test_config_defaults():
    cfg = EngineConfig()
    assert cfg.kafka_bootstrap_servers == "localhost:9092"
    assert cfg.default_key_field == "userId"
    assert cfg.checkpoint_interval_ms == 60_000


@pytest.mark.parametrize(
    "kwargs",
    [
        {"kafka_input_topic": " "},
        {"parallelism": 0},
        {"checkpoint_interval_ms": 0},
        {"health_port": 70_000},
        {"default_key_field": ""},
    ],
)
def test_config_validation(kwargs):
    with pytest.raises(ValueError):
        EngineConfig(**kwargs)


def test_config_from_environment(monkeypatch):
    monkeypatch.setenv("KAFKA_INPUT_TOPIC", "tx")
    monkeypatch.setenv("FLINK_PARALLELISM", "4")
    cfg = EngineConfig.from_environment()
    assert cfg.kafka_input_topic == "tx"
    assert cfg.parallelism == 4


def test_config_bad_numeric_env(monkeypatch):
    monkeypatch.setenv("FLINK_PARALLELISM", "abc")
    with pytest.raises(RuntimeError, match="Failed to parse numeric"):
        EngineConfig.from_environment()
