"""Semantics tests for operators/analytics.py (funnel, cohorts,
transitions, EWMA) and the x55 skew report — hand-built fixtures with
independently computed expectations."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from stream_sentinel_spark.operators.analytics import (
    collapse_runs,
    event_transitions,
    ewma,
    funnel,
    retention_cohorts,
)
from stream_sentinel_spark.operators.skew import skew_report


def _ts(s: int):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def test_funnel_strict_ordering(spark):
    rows = [
        # u1 completes the funnel in order
        (1, 1, "signup", _ts(0), 0.0),
        (2, 1, "click", _ts(10), 0.0),
        (3, 1, "purchase", _ts(20), 0.0),
        # u2 clicks BEFORE signing up — click must not count
        (4, 2, "click", _ts(0), 0.0),
        (5, 2, "signup", _ts(10), 0.0),
        # u3 signs up only
        (6, 3, "signup", _ts(0), 0.0),
        # u4 never signs up
        (7, 4, "click", _ts(0), 0.0),
        (8, 4, "purchase", _ts(5), 0.0),
    ]
    out = {
        r["event_type"]: r["users"]
        for r in funnel(
            _events(spark, rows), ["signup", "click", "purchase"]
        ).collect()
    }
    assert out == {"signup": 3, "click": 1, "purchase": 1}


def test_funnel_simultaneous_events_do_not_chain(spark):
    rows = [
        (1, 1, "signup", _ts(0), 0.0),
        (2, 1, "click", _ts(0), 0.0),  # same instant: strictly-after fails
        (3, 2, "signup", _ts(0), 0.0),
        (4, 2, "click", _ts(1), 0.0),
    ]
    out = {
        r["event_type"]: r["users"]
        for r in funnel(_events(spark, rows), ["signup", "click"]).collect()
    }
    assert out == {"signup": 2, "click": 1}


def test_funnel_later_earlier_step_does_not_resurrect(spark):
    # u1: click at t5 (after signup t0) then purchase at t3 — purchase
    # precedes the click entry, so step 3 is not reached.
    rows = [
        (1, 1, "signup", _ts(0), 0.0),
        (2, 1, "purchase", _ts(3), 0.0),
        (3, 1, "click", _ts(5), 0.0),
    ]
    out = {
        r["event_type"]: r["users"]
        for r in funnel(
            _events(spark, rows), ["signup", "click", "purchase"]
        ).collect()
    }
    assert out == {"signup": 1, "click": 1, "purchase": 0}


def test_funnel_requires_steps(spark):
    with pytest.raises(ValueError):
        funnel(_events(spark, []), [])


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------


def test_retention_cohorts_offsets(spark):
    wk = 7 * 86_400
    rows = [
        # u1 first seen week 0, active weeks 0 and 2
        (1, 1, "view", _ts(0), 0.0),
        (2, 1, "view", _ts(2 * wk + 5), 0.0),
        # duplicate activity in the same week counts once
        (3, 1, "view", _ts(2 * wk + 9), 0.0),
        # u2 first seen week 1, active weeks 1 and 2
        (4, 2, "view", _ts(wk + 1), 0.0),
        (5, 2, "view", _ts(2 * wk + 1), 0.0),
    ]
    out = {
        (r["cohort_week"] - 2817, r["week_offset"]): r["users"]
        # 2817 = epoch week of 2024-01-01 (floor(1704067200/604800))
        for r in retention_cohorts(_events(spark, rows)).collect()
    }
    assert out == {(0, 0): 1, (0, 2): 1, (1, 0): 1, (1, 1): 1}


# ---------------------------------------------------------------------------
# transitions
# ---------------------------------------------------------------------------


def test_event_transitions_counts_and_probs(spark):
    rows = [
        (1, 1, "a", _ts(0), 0.0),
        (2, 1, "b", _ts(1), 0.0),
        (3, 1, "a", _ts(2), 0.0),
        (4, 1, "c", _ts(3), 0.0),
        (5, 2, "a", _ts(0), 0.0),
        (6, 2, "b", _ts(1), 0.0),
    ]
    out = {
        (r["src_type"], r["dst_type"]): (r["n"], r["prob"])
        for r in event_transitions(_events(spark, rows)).collect()
    }
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "c")] == (1, 1 / 3)
    assert out[("b", "a")] == (1, 1.0)
    # last event of each user emits no pair
    assert sum(n for n, _ in out.values()) == 4


def test_event_transitions_tie_break_by_event_id(spark):
    rows = [
        (2, 1, "b", _ts(0), 0.0),
        (1, 1, "a", _ts(0), 0.0),  # same ts: event_id orders a before b
    ]
    out = {
        (r["src_type"], r["dst_type"]): r["n"]
        for r in event_transitions(_events(spark, rows)).collect()
    }
    assert out == {("a", "b"): 1}


# ---------------------------------------------------------------------------
# collapse_runs (consecutive-duplicate compaction)
# ---------------------------------------------------------------------------

def test_collapse_runs_counts_run_continuations(spark):
    rows = [
        (1, 1, "a", _ts(0), 0.0),
        (2, 1, "a", _ts(1), 0.0),  # continuation → collapsed
        (3, 1, "b", _ts(2), 0.0),
        (4, 1, "a", _ts(3), 0.0),  # run restart after b → kept
        (5, 2, "a", _ts(0), 0.0),  # single event user: nothing collapses
    ]
    out = {
        r.user_id: (r.n_events, r.n_collapsed, r.n_kept)
        for r in collapse_runs(_events(spark, rows)).collect()
    }
    assert out[1] == (4, 1, 3)
    assert out[2] == (1, 0, 1)


def test_collapse_runs_tie_break_by_event_id(spark):
    # Same ts: event_id orders a,a → one collapsed; without the
    # tie-break the result would be nondeterministic.
    rows = [
        (2, 1, "a", _ts(0), 0.0),
        (1, 1, "a", _ts(0), 0.0),
        (3, 1, "b", _ts(1), 0.0),
    ]
    out = {
        r.user_id: (r.n_events, r.n_collapsed, r.n_kept)
        for r in collapse_runs(_events(spark, rows)).collect()
    }
    assert out[1] == (3, 1, 2)


def test_collapse_runs_all_distinct_keeps_everything(spark):
    rows = [
        (1, 1, "a", _ts(0), 0.0),
        (2, 1, "b", _ts(1), 0.0),
        (3, 1, "c", _ts(2), 0.0),
    ]
    out = collapse_runs(_events(spark, rows)).collect()
    assert out[0].n_collapsed == 0 and out[0].n_kept == 3


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_matches_hand_fold(spark):
    alpha, window = 0.25, 3
    vals = [10.0, 20.0, 40.0, 80.0]
    rows = [(i, 1, "v", _ts(i), v) for i, v in enumerate(vals)]
    out = {
        r["event_id"]: (r["n_window"], r["ewma"])
        for r in ewma(
            _events(spark, rows), alpha=alpha, window=window
        ).collect()
    }

    def expect(tail):
        k = len(tail)
        ws = [(1 - alpha) ** (k - 1 - j) for j in range(k)]
        return round(sum(v * w for v, w in zip(tail, ws)) / sum(ws), 6)

    assert out[0] == (1, expect(vals[:1]))
    assert out[1] == (2, expect(vals[:2]))
    assert out[2] == (3, expect(vals[:3]))
    # window truncates: event 3 sees only the last 3 values
    assert out[3] == (3, expect(vals[1:]))


def test_ewma_newest_dominates(spark):
    rows = [(i, 1, "v", _ts(i), float(v)) for i, v in enumerate([0, 0, 100])]
    out = ewma(_events(spark, rows), alpha=0.5, window=8).collect()
    last = max(out, key=lambda r: r["event_id"])
    # weights 0.25, 0.5, 1 (normalized): newest carries 4/7 of the mass
    assert math.isclose(last["ewma"], round(100 * 1 / (0.25 + 0.5 + 1), 6))


def test_ewma_rejects_bad_alpha(spark):
    with pytest.raises(ValueError):
        ewma(_events(spark, []), alpha=1.0)


# ---------------------------------------------------------------------------
# skew report
# ---------------------------------------------------------------------------


def test_skew_report_exact_values(spark):
    # 4 keys with bucket sizes 1, 1, 2, 6
    rows = [("a",)] * 1 + [("b",)] * 1 + [("c",)] * 2 + [("d",)] * 6
    df = spark.createDataFrame(rows, "k string")
    r = skew_report(df, "k", percentile=0.75).collect()[0]
    assert (r["n_keys"], r["n_rows"], r["max_n"]) == (4, 10, 6)
    # nearest-rank p75 over sizes [1,1,2,6]: rank ceil(0.75*4)=3 -> 2
    assert r["p_n"] == 2
    assert r["mean_n"] == 2.5
    assert r["skew_ratio"] == 6 * 4 / 10


def test_skew_report_rejects_bad_percentile(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        skew_report(df, "k", percentile=0.0)


# ---------------------------------------------------------------------------
# resample + fill
# ---------------------------------------------------------------------------


def test_resample_fill_carries_forward(spark):
    from stream_sentinel_spark.operators.analytics import resample_fill

    hr = 3600
    rows = [
        (1, 1, "v", _ts(0), 10.0),        # hour 0
        (2, 1, "v", _ts(3 * hr + 5), 30.0),  # hour 3 — hours 1,2 are gaps
        (3, 2, "v", _ts(hr), 5.0),        # single-bucket user
    ]
    out = {
        (r["user"], r["bucket_ms"]): (r["value"], r["is_gap"])
        for r in resample_fill(_events(spark, rows)).collect()
    }
    base = 1704067200000  # 2024-01-01 epoch ms
    assert out[(1, base)] == (10.0, False)
    assert out[(1, base + 3600_000)] == (10.0, True)   # filled
    assert out[(1, base + 7200_000)] == (10.0, True)   # filled
    assert out[(1, base + 10800_000)] == (30.0, False)
    assert out[(2, base + 3600_000)] == (5.0, False)
    assert len(out) == 5  # grid is span-bounded per user, no global grid


def test_resample_fill_in_bucket_latest_wins(spark):
    from stream_sentinel_spark.operators.analytics import resample_fill

    rows = [
        (1, 1, "v", _ts(10), 1.0),
        (2, 1, "v", _ts(20), 2.0),  # same hour, later ts wins
    ]
    out = resample_fill(_events(spark, rows)).collect()
    assert len(out) == 1 and out[0]["value"] == 2.0


# ---------------------------------------------------------------------------
# CUSUM
# ---------------------------------------------------------------------------


def test_cusum_matches_clamped_recursion(spark):
    from stream_sentinel_spark.operators.analytics import cusum

    target, h = 10.0, 5.0
    vals = [12.0, 8.0, 14.0, 13.0, 1.0, 11.0]
    rows = [(i, 1, "v", _ts(i), v) for i, v in enumerate(vals)]
    out = {
        r["event_id"]: (r["cusum"], r["alarm"])
        for r in cusum(
            _events(spark, rows), target=target, threshold=h
        ).collect()
    }
    s, expect = 0.0, {}
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - target))
        expect[i] = (s, s > h)
    assert out == expect


def test_cusum_resets_after_deficit(spark):
    from stream_sentinel_spark.operators.analytics import cusum

    # big deficit then small excesses: the clamp must reset to 0, not
    # carry the negative balance (that is what distinguishes CUSUM from
    # a plain running sum)
    vals = [0.0, 15.0]
    rows = [(i, 1, "v", _ts(i), v) for i, v in enumerate(vals)]
    out = {
        r["event_id"]: r["cusum"]
        for r in cusum(_events(spark, rows), target=10.0, threshold=99.0).collect()
    }
    assert out[0] == 0.0  # clamped, not -10
    assert out[1] == 5.0  # 0 + (15-10), not -5


def test_cusum_is_per_user(spark):
    from stream_sentinel_spark.operators.analytics import cusum

    rows = [(1, 1, "v", _ts(0), 20.0), (2, 2, "v", _ts(1), 20.0)]
    out = {
        r["event_id"]: r["cusum"]
        for r in cusum(_events(spark, rows), target=10.0, threshold=5.0).collect()
    }
    assert out == {1: 10.0, 2: 10.0}


# ---------------------------------------------------------------------------
# linear trend
# ---------------------------------------------------------------------------


def test_linear_trend_exact_line(spark):
    from stream_sentinel_spark.operators.analytics import linear_trend

    hr = 3600
    # y = 2.5 * x + 10 exactly, hourly points
    rows = [(i, 1, "v", _ts(i * hr), 10.0 + 2.5 * i) for i in range(5)]
    r = linear_trend(_events(spark, rows)).collect()[0]
    assert (r["n"], r["slope"], r["intercept"]) == (5, 2.5, 10.0)


def test_linear_trend_numpy_parity(spark):
    import numpy as np

    from stream_sentinel_spark.operators.analytics import linear_trend

    hr = 3600
    vals = [3.25, 7.5, 2.0, 9.75, 4.5, 8.25]
    rows = [(i, 1, "v", _ts(i * hr), v) for i, v in enumerate(vals)]
    r = linear_trend(_events(spark, rows)).collect()[0]
    slope, intercept = np.polyfit(np.arange(len(vals)), np.array(vals), 1)
    assert abs(r["slope"] - slope) < 1e-6
    assert abs(r["intercept"] - intercept) < 1e-6


def test_linear_trend_single_bucket_zero_slope(spark):
    from stream_sentinel_spark.operators.analytics import linear_trend

    rows = [(0, 1, "v", _ts(10), 5.0), (1, 1, "v", _ts(20), 7.0)]  # same hour
    r = linear_trend(_events(spark, rows)).collect()[0]
    assert r["slope"] == 0.0  # zero x-variance: no defined trend
    assert r["intercept"] == 6.0  # mean


def test_linear_trend_shift_invariance(spark):
    """Slope must not depend on the absolute epoch (the algebraic
    offset shift) — same data a year later gives the same slope."""
    import datetime as dt

    from stream_sentinel_spark.operators.analytics import linear_trend

    hr = 3600
    rows1 = [(i, 1, "v", _ts(i * hr), float(i * i)) for i in range(6)]
    shift = 365 * 24 * 3600
    rows2 = [(i, 1, "v", _ts(i * hr + shift), float(i * i)) for i in range(6)]
    r1 = linear_trend(_events(spark, rows1)).collect()[0]
    r2 = linear_trend(_events(spark, rows2)).collect()[0]
    assert r1["slope"] == r2["slope"] and r1["intercept"] == r2["intercept"]


def test_linear_trend_huge_values_no_overflow(spark):
    """Regression: raw epoch-hour x times decimal(18,2)-max-scale values
    overflowed int64 accumulators (ANSI ARITHMETIC_OVERFLOW); the
    decimal(38,0) statistics must survive the full documented domain."""
    from stream_sentinel_spark.operators.analytics import linear_trend

    hr = 3600
    rows = [(i, 1, "v", _ts(i * hr), 1e14 * i) for i in range(5)]
    r = linear_trend(_events(spark, rows)).collect()[0]
    assert r["n"] == 5 and r["slope"] == 1e14


# ---------------------------------------------------------------------------
# robust_outliers (x77)
# ---------------------------------------------------------------------------


def _typed_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_robust_outliers_known_values(spark):
    from stream_sentinel_spark.operators.analytics import robust_outliers

    rows = [
        # odd count: values 1..7 plus one wild outlier 100
        # sorted: 1 2 3 4 5 6 7 100 → even n=8, median = (4+5)/2 = 4.5
        # devs: 3.5 2.5 1.5 .5 .5 1.5 2.5 95.5 → sorted .5 .5 1.5 1.5
        # 2.5 2.5 3.5 95.5 → MAD = (1.5+2.5)/2 = 2.0
        # threshold = 3*1.4826*2.0 = 8.8956 → only 95.5 exceeds
        (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0), (4, "a", 4.0),
        (5, "a", 5.0), (6, "a", 6.0), (7, "a", 7.0), (8, "a", 100.0),
        # odd count 3: median 20, devs 10 0 10 → MAD 10, none > 44.478
        (9, "b", 10.0), (10, "b", 20.0), (11, "b", 30.0),
        # NULL value rows are excluded before ranking
        (12, "b", None),
    ]
    got = {
        r.event_type: r
        for r in robust_outliers(
            _typed_events(spark, rows), order_col="event_id"
        ).collect()
    }
    a = got["a"]
    assert (a.n_events, a.median_value, a.mad, a.n_outliers) == (8, 4.5, 2.0, 1)
    b = got["b"]
    assert (b.n_events, b.median_value, b.mad, b.n_outliers) == (3, 20.0, 10.0, 0)


def test_robust_outliers_mad_zero_degenerate(spark):
    from stream_sentinel_spark.operators.analytics import robust_outliers

    # > half identical → MAD 0 → every deviating row flags (and the
    # identical rows don't: 0 > 0 is false)
    rows = [(i, "k", 5.0) for i in range(1, 6)] + [(6, "k", 5.1), (7, "k", 9.0)]
    r = robust_outliers(_typed_events(spark, rows), order_col="event_id").collect()[0]
    assert (r.n_events, r.median_value, r.mad, r.n_outliers) == (7, 5.0, 0.0, 2)


def test_robust_outliers_single_row_key(spark):
    from stream_sentinel_spark.operators.analytics import robust_outliers

    r = robust_outliers(
        _typed_events(spark, [(1, "solo", 42.0)]), order_col="event_id"
    ).collect()[0]
    assert (r.n_events, r.median_value, r.mad, r.n_outliers) == (1, 42.0, 0.0, 0)
