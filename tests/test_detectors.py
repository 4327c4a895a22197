"""Ports of the reference's detector unit tests (13 cases) against the
batch rule compiler.

Reference: ThresholdDetectorTest.java:32-79, RateSpikeDetectorTest.java:33-77,
StatisticalOutlierDetectorTest.java:33-79. Same inputs, same fire/no-fire
assertions, same `details` strings.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import types as T

from stream_sentinel_spark.plans.pipeline import compile_rule, compile_rules
from stream_sentinel_spark.rules import DetectionRule

T0 = datetime(2024, 1, 15, 10, 0, 0)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

STRING_AMOUNT_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.StringType()),
        T.StructField("amount", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def events(spark, rows, schema=EVENT_SCHEMA):
    return spark.createDataFrame(rows, schema)


def alerts_of(df, rule, **kw):
    kw.setdefault("key_field", "userId")
    out = compile_rule(df, rule, **kw)
    return out.orderBy("alert_ts", "rule_index").collect()


# --- ThresholdDetector ----------------------------------------------------

THRESHOLD_RULE = DetectionRule(name="test_threshold", type="threshold", field="amount", threshold=500)


def test_threshold_fires_above(spark):
    df = events(spark, [("u1", 1000.0, T0)])
    got = alerts_of(df, THRESHOLD_RULE)
    assert len(got) == 1
    a = got[0]
    assert a.rule_name == "test_threshold"
    assert a.key == "u1"
    assert a.details == "Threshold exceeded: amount=1000.00 (threshold: 500.00)"
    assert a.original_event["amount"] == "1000.0"


def test_threshold_no_fire_below(spark):
    df = events(spark, [("u1", 100.0, T0)])
    assert alerts_of(df, THRESHOLD_RULE) == []


def test_threshold_no_fire_at_exact_equality(spark):
    # strict > at ThresholdDetector.java:59
    df = events(spark, [("u1", 500.0, T0)])
    assert alerts_of(df, THRESHOLD_RULE) == []


def test_threshold_no_fire_missing_field(spark):
    df = events(spark, [("u1", None, T0)])
    assert alerts_of(df, THRESHOLD_RULE) == []


def test_threshold_fires_on_string_encoded_number(spark):
    # ThresholdDetectorTest.java:70-79
    rule = DetectionRule(name="t", type="threshold", field="amount", threshold=10000)
    df = events(spark, [("u1", "20000", T0)], STRING_AMOUNT_SCHEMA)
    got = alerts_of(df, rule)
    assert len(got) == 1
    assert got[0].details == "Threshold exceeded: amount=20000.00 (threshold: 10000.00)"


def test_threshold_no_fire_non_numeric_string(spark):
    df = events(spark, [("u1", "abc", T0)], STRING_AMOUNT_SCHEMA)
    assert alerts_of(df, DetectionRule(name="t", type="threshold", field="amount", threshold=1)) == []


# --- RateSpikeDetector ----------------------------------------------------

RATE_RULE = DetectionRule(name="test_rate", type="rate", key_field="userId", window_seconds=5, threshold=3)


def seq(n, start=T0, step=1.0, user="u1", amount=10.0):
    return [(user, amount, start + timedelta(seconds=i * step)) for i in range(n)]


def test_rate_no_fire_at_count_equals_threshold(spark):
    # 3 events, threshold 3 — strict > at RateSpikeDetector.java:94
    df = events(spark, seq(3))
    assert alerts_of(df, RATE_RULE) == []


def test_rate_fires_on_fourth_event(spark):
    df = events(spark, seq(4))
    got = alerts_of(df, RATE_RULE)
    assert len(got) == 1
    assert got[0].details == "Rate spike: 4 events in 5 seconds (threshold: 3)"
    assert got[0].alert_ts == T0 + timedelta(seconds=3)


def test_rate_window_eviction(spark):
    # RateSpikeDetectorTest.java:60-77 — 3 events at t, 1 at t+11s,
    # 10 s window: old ones evicted, count=1, no fire.
    rule = DetectionRule(name="r", type="rate", key_field="userId", window_seconds=10, threshold=3)
    rows = seq(3, step=0.0) + [("u1", 10.0, T0 + timedelta(seconds=11))]
    assert alerts_of(events(spark, rows), rule) == []


def test_rate_boundary_timestamp_kept(spark):
    # evict is strict < (RateSpikeDetector.java:85): an event exactly
    # windowSeconds old is still inside the window.
    rule = DetectionRule(name="r", type="rate", key_field="userId", window_seconds=10, threshold=3)
    rows = seq(3, step=0.0) + [("u1", 10.0, T0 + timedelta(seconds=10))]
    got = alerts_of(events(spark, rows), rule)
    assert len(got) == 1
    assert got[0].details == "Rate spike: 4 events in 10 seconds (threshold: 3)"


def test_rate_fires_per_event_while_over(spark):
    # fires on EVERY event while over threshold
    df = events(spark, seq(6))
    got = alerts_of(df, RATE_RULE)
    assert [a.details for a in got] == [
        "Rate spike: 4 events in 5 seconds (threshold: 3)",
        "Rate spike: 5 events in 5 seconds (threshold: 3)",
        "Rate spike: 6 events in 5 seconds (threshold: 3)",
    ]


def test_rate_keys_independent(spark):
    df = events(spark, seq(4, user="a") + seq(3, user="b"))
    got = alerts_of(df, RATE_RULE)
    assert len(got) == 1
    assert got[0].key == "a"


# --- StatisticalOutlierDetector -------------------------------------------

STAT_RULE = DetectionRule(
    name="test_stat", type="statistical", field="amount", window_size=10, deviation_factor=2.0
)


def vals(values, user="u1", start=T0):
    return [(user, float(v), start + timedelta(seconds=i)) for i, v in enumerate(values)]


def test_statistical_warm_up_never_fires(spark):
    # MIN_HISTORY_SIZE=2 (StatisticalOutlierDetector.java:45,92):
    # first two events have history 0 and 1 → never fire, however extreme.
    df = events(spark, vals([100.0, 99999.0]))
    assert alerts_of(df, STAT_RULE) == []


def test_statistical_no_fire_within_band(spark):
    # StatisticalOutlierDetectorTest.java:41-51 — history 100..104, then
    # 103 is well within 2σ. The reference asserts only the final
    # evaluate; intermediate warm-up events may legitimately fire.
    last_ts = T0 + timedelta(seconds=5)
    df = events(spark, vals([100, 101, 102, 103, 104, 103]))
    got = alerts_of(df, STAT_RULE)
    assert [a for a in got if a.alert_ts == last_ts] == []


def test_statistical_fires_on_extreme_outlier(spark):
    # StatisticalOutlierDetectorTest.java:53-66 — history 5×100, then 10000.
    df = events(spark, vals([100, 100, 100, 100, 100, 10000]))
    got = alerts_of(df, STAT_RULE)
    assert len(got) == 1
    assert got[0].rule_name == "test_stat"
    assert got[0].alert_ts == T0 + timedelta(seconds=5)
    assert got[0].details.startswith("Statistical outlier: amount=10000.00 (mean=100.00")


def test_statistical_sigma_zero_rule(spark):
    # σ=0 → ANY different value fires (StatisticalOutlierDetector.java:96-99):
    # 5×100 then 101.
    df = events(spark, vals([100, 100, 100, 100, 100, 101]))
    got = alerts_of(df, STAT_RULE)
    assert len(got) == 1
    assert got[0].details == (
        "Statistical outlier: amount=101.00 (mean=100.00, stddev=0.00, factor=2.0)"
    )


def test_statistical_missing_field_skipped_window_untouched(spark):
    # A missing-amount event is invisible: window state unchanged
    # (StatisticalOutlierDetector.java:83-86).
    rows = vals([100, 100, 100, 100, 100])
    rows.append(("u1", None, T0 + timedelta(seconds=5)))
    rows.append(("u1", 101.0, T0 + timedelta(seconds=6)))
    got = alerts_of(events(spark, rows), STAT_RULE)
    assert len(got) == 1
    assert got[0].alert_ts == T0 + timedelta(seconds=6)


def test_statistical_population_stddev(spark):
    # Window [10, 20] → mean 15, population σ = 5 (sample σ would be
    # ~7.07). factor 2 → bound 10. v=26: |26-15|=11 > 10 fires with
    # population σ, would NOT fire (11 < 14.14) with sample σ.
    rule = DetectionRule(name="s", type="statistical", field="amount", window_size=10, deviation_factor=2.0)
    df = events(spark, vals([10, 20, 26]))
    got = alerts_of(df, rule)
    assert len(got) == 1
    assert got[0].details == (
        "Statistical outlier: amount=26.00 (mean=15.00, stddev=5.00, factor=2.0)"
    )


def test_statistical_evaluate_before_insert(spark):
    # The current value is excluded from its own window: frame ends at
    # 1 PRECEDING (StatisticalOutlierDetector.java:122-127).
    # [100, 100, 100] then 200: window for 200 is three 100s (σ=0) → fires.
    # If the current value leaked into the window, σ>0 and mean shifts.
    df = events(spark, vals([100, 100, 100, 200]))
    got = alerts_of(events(spark, vals([100, 100, 100, 200])), STAT_RULE)
    assert len(got) == 1
    assert "mean=100.00, stddev=0.00" in got[0].details


def test_statistical_window_trim(spark):
    # windowSize=3: only the last 3 values count. 1000s early on must
    # age out: [1000, 1000, 1000, 100, 100, 100, 101] with size 3 →
    # the 101 sees window [100,100,100], σ=0 → fires.
    rule = DetectionRule(name="s", type="statistical", field="amount", window_size=3, deviation_factor=2.0)
    df = events(spark, vals([1000, 1000, 1000, 100, 100, 100, 101]))
    got = alerts_of(df, rule)
    details = [a.details for a in got]
    assert details[-1] == (
        "Statistical outlier: amount=101.00 (mean=100.00, stddev=0.00, factor=2.0)"
    )


# --- multi-rule pipeline ---------------------------------------------------

def test_compile_rules_union_and_rule_index(spark):
    rules = [
        DetectionRule(name="t1", type="threshold", field="amount", threshold=500),
        DetectionRule(name="t2", type="threshold", field="amount", threshold=900),
    ]
    df = events(spark, [("u1", 1000.0, T0)])
    got = compile_rules(df, rules, key_field="userId").orderBy("rule_index").collect()
    assert [(a.rule_name, a.rule_index) for a in got] == [("t1", 0), ("t2", 1)]


def test_compile_rules_empty_set_fatal(spark):
    df = events(spark, [("u1", 1.0, T0)])
    with pytest.raises(ValueError, match="No detection rules"):
        compile_rules(df, [], key_field="userId")


def test_missing_key_sentinel(spark):
    df = events(spark, [(None, 1000.0, T0)])
    got = alerts_of(df, THRESHOLD_RULE)
    assert got[0].key == "__unknown__"
