"""CUSUM drift rule (engine extension): batch compiler semantics,
YAML loading through the extension validator, and details formatting.
Batch ≡ streaming parity lives in test_streaming_parity.py."""

from __future__ import annotations

import datetime as dt

import pytest

from stream_sentinel_spark.loader import loads_rules
from stream_sentinel_spark.operators.cusum import compile_cusum
from stream_sentinel_spark.plans.pipeline import compile_rules
from stream_sentinel_spark.rules import DetectionRule, RuleValidationError


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id string, value double, ts timestamp"
    )


def _rule(**kw):
    base = dict(
        name="drift", type="cusum", field="value", target=10.0, threshold=5.0
    )
    base.update(kw)
    return DetectionRule(**base)


def _sim(vals, target, threshold):
    """Independent python recursion: s = max(0, s + v - t), fire s > h."""
    s, fired = 0.0, []
    for i, v in enumerate(vals):
        s = max(0.0, s + v - target)
        fired.append((i, round(s, 2), s > threshold + 1e-12))
    return [i for i, _, f in fired if f]


def test_cusum_fires_match_recursion(spark):
    vals = [12.0, 13.0, 8.0, 14.0, 1.0, 16.0, 16.0]
    rows = [(i, "u", v, _ts(i)) for i, v in enumerate(vals)]
    out = compile_cusum(
        _events(spark, rows), _rule(), key_field="user_id",
        order_cols=("event_id",),
    ).collect()
    fired_ids = sorted(r["original_event"]["event_id"] for r in out)
    assert fired_ids == [str(i) for i in _sim(vals, 10.0, 5.0)]


def test_cusum_details_format(spark):
    rows = [(0, "u", 25.5, _ts(0))]
    out = compile_cusum(
        _events(spark, rows), _rule(), key_field="user_id"
    ).collect()
    assert len(out) == 1
    # s = max(0, 0 + 25.5 - 10) = 15.5 > 5
    assert out[0]["details"] == (
        "CUSUM drift: value=25.50 (cusum=15.50, target=10.00, threshold=5.00)"
    )
    assert out[0]["rule_name"] == "drift" and out[0]["key"] == "u"


def test_cusum_null_values_skip_without_reset(spark):
    df = spark.createDataFrame(
        [(0, "u", "12.0", _ts(0)), (1, "u", "not-a-number", _ts(1)),
         (2, "u", "13.0", _ts(2))],
        "event_id long, user_id string, value string, ts timestamp",
    )
    out = compile_cusum(
        df, _rule(), key_field="user_id", order_cols=("event_id",)
    ).collect()
    # event 1 is invisible: s goes 2.0 then 5.0 — never > 5 strictly…
    assert [r["original_event"]["event_id"] for r in out] == []
    df2 = spark.createDataFrame(
        [(0, "u", "12.0", _ts(0)), (1, "u", "x", _ts(1)), (2, "u", "13.01", _ts(2))],
        "event_id long, user_id string, value string, ts timestamp",
    )
    out2 = compile_cusum(
        df2, _rule(), key_field="user_id", order_cols=("event_id",)
    ).collect()
    # …but 13.01 pushes s to 5.01 > 5: the skip preserved the balance
    assert [r["original_event"]["event_id"] for r in out2] == ["2"]


def test_cusum_is_per_key(spark):
    rows = [(0, "a", 16.0, _ts(0)), (1, "b", 16.0, _ts(1))]
    out = compile_cusum(
        _events(spark, rows), _rule(), key_field="user_id"
    ).collect()
    assert sorted(r["key"] for r in out) == ["a", "b"]


def test_cusum_strict_threshold(spark):
    rows = [(0, "u", 15.0, _ts(0))]  # s = 5.0 == threshold: no fire
    assert (
        compile_cusum(_events(spark, rows), _rule(), key_field="user_id").count()
        == 0
    )


def test_cusum_loads_from_yaml_and_compiles(spark):
    rules = loads_rules(
        """
rules:
  - name: value_drift
    type: cusum
    field: value
    target: 10.0
    threshold: 5.0
"""
    )
    assert len(rules) == 1 and rules[0].type == "cusum"
    assert rules[0].target == 10.0
    rows = [(0, "u", 25.5, _ts(0))]
    alerts = compile_rules(
        _events(spark, rows), rules, key_field="user_id", time_col="ts"
    ).collect()
    assert len(alerts) == 1 and alerts[0]["rule_name"] == "value_drift"


def test_cusum_validation_errors():
    with pytest.raises(RuleValidationError, match="requires 'field'"):
        DetectionRule(name="d", type="cusum", threshold=1.0).validate()
    with pytest.raises(RuleValidationError, match="requires 'threshold' > 0"):
        DetectionRule(name="d", type="cusum", field="v").validate()


def test_unknown_type_message_unchanged():
    """Registering an extension must not alter the reference's
    unknown-type error text (DetectionRule.java parity)."""
    with pytest.raises(
        RuleValidationError,
        match="Unknown rule type: 'bogus'. Supported: rate, threshold, statistical",
    ):
        DetectionRule(name="d", type="bogus").validate()
