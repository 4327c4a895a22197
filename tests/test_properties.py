"""Property-based parity (SURVEY §5.5): on RANDOM event corpora, the
compiled Spark plans must emit the identical alert set to the pure-
Python reference simulation (tests/reference_sim.py) — including
missing keys (sentinel group), missing/None values (skip semantics),
warm-up guards, σ=0 and boundary cases the fixtures may never hit.

Generation constraints that keep the comparison exact, not flaky:
- timestamps are unique and ms-aligned (no RANGE-frame peer ambiguity,
  no µs truncation skew);
- values are integer-valued doubles and the statistical window ≤ 4, so
  window means are exact dyadic rationals — no decimal-rounding ties
  between Java ``%.2f`` (HALF_UP) and Python ``%`` (half-even).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from stream_sentinel_spark.plans.pipeline import compile_rules
from stream_sentinel_spark.rules import DetectionRule
from tests.reference_sim import simulate

RULES = [
    DetectionRule(name="r_rate", type="rate", key_field="user_id",
                  window_seconds=5, threshold=2),
    DetectionRule(name="r_thr", type="threshold", field="value", threshold=10.0),
    DetectionRule(name="r_stat", type="statistical", field="value",
                  window_size=4, deviation_factor=2.0),
]

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

BASE = datetime(2024, 1, 1, tzinfo=timezone.utc)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    gaps = draw(
        st.lists(st.integers(min_value=1, max_value=4000), min_size=n, max_size=n)
    )
    keys = draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
            min_size=n, max_size=n,
        )
    )
    values = draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=0, max_value=20)),
            min_size=n, max_size=n,
        )
    )
    events, t = [], BASE
    for i in range(n):
        t = t + timedelta(milliseconds=gaps[i])
        events.append(
            {
                "event_id": i,
                "ts": t,
                "user_id": keys[i],
                "value": None if values[i] is None else float(values[i]),
            }
        )
    return events


def _spark_alerts(spark, events):
    rows = [
        (e["event_id"], e["ts"], e["user_id"], e["value"]) for e in events
    ]
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    alerts = compile_rules(
        df, RULES, key_field="user_id", time_col="ts", order_cols=("event_id",)
    )
    out = [
        (r["rule_name"], r["key"], r["alert_ts"], r["details"], r["rule_index"])
        for r in alerts.collect()
    ]
    return sorted(out, key=lambda a: (a[1], a[2], a[4]))


# slow tier: hypothesis sweep; the reference-sim parity runs at default size on the golden corpus
@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=corpora())
def test_random_corpus_matches_reference_sim(spark, events):
    got = _spark_alerts(spark, events)
    want = [
        (a[0], a[1], a[2].replace(tzinfo=None), a[3], a[4])
        for a in simulate(events, RULES, key_field="user_id")
    ]
    got = [(a[0], a[1], a[2], a[3], a[4]) for a in got]
    assert got == want


def test_threshold_equiv_filter(spark):
    """Threshold rule ≡ plain filter: same cardinality as value > t."""
    events = [
        {"event_id": i, "ts": BASE + timedelta(seconds=i), "user_id": i % 3,
         "value": float(i)}
        for i in range(40)
    ]
    got = _spark_alerts(spark, events)
    thr = [a for a in got if a[0] == "r_thr"]
    assert len(thr) == sum(1 for e in events if e["value"] > 10.0)


def test_rate_invariant_under_key_renaming(spark):
    """Renaming keys bijectively must not change the rate alert count."""
    events = [
        {"event_id": i, "ts": BASE + timedelta(milliseconds=400 * i),
         "user_id": i % 2, "value": 1.0}
        for i in range(30)
    ]
    renamed = [dict(e, user_id=e["user_id"] + 7) for e in events]
    n1 = sum(1 for a in _spark_alerts(spark, events) if a[0] == "r_rate")
    n2 = sum(1 for a in _spark_alerts(spark, renamed) if a[0] == "r_rate")
    assert n1 == n2 > 0


# ---------------------------------------------------------------------------
# Sequence packing (round 9): on RANDOM token-count corpora both packing
# regimes must satisfy their invariants exactly — next-fit must equal a
# sequential Python reference per shard, and bucketing must respect
# capacity with equal-length windows.
# ---------------------------------------------------------------------------


# slow tier: hypothesis sweep over both packing impls; closed-form cases run at default size in test_curation/test_oracle_parity (x106-x109)
@pytest.mark.slow
@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                   max_size=60),
    cap=st.integers(min_value=1, max_value=128),
)
def test_pack_sequences_random_invariants(spark, sizes, cap):
    from stream_sentinel_spark.operators.curation import (
        pack_sequences,
        pack_sequences_bucketed,
    )

    docs = spark.createDataFrame(
        list(enumerate(sizes)), "doc_id long, n_tok long"
    )
    for fn in (pack_sequences, pack_sequences_bucketed):
        rows = fn(docs, "doc_id", "n_tok", context_len=cap, n_shards=3).collect()
        # zero-token docs drop; everything else packs exactly once
        assert sorted(r.doc_id for r in rows) == [
            i for i, s in enumerate(sizes) if s > 0
        ]
        by_win = {}
        for r in rows:
            assert r.n_tok_packed == min(sizes[r.doc_id], cap)
            assert r.truncated == (sizes[r.doc_id] > cap)
            assert 0 <= r.win_offset
            assert r.win_offset + r.n_tok_packed <= cap
            by_win.setdefault((r.shard, r.window_id), []).append(r)
        # within a window: disjoint dense spans starting at 0
        for members in by_win.values():
            members.sort(key=lambda m: m.win_offset)
            pos = 0
            for m in members:
                assert m.win_offset == pos
                pos += m.n_tok_packed
    # next-fit specifically: equality with the sequential reference
    got = sorted(
        (r.shard, r.doc_id, r.window_id, r.win_offset)
        for r in pack_sequences(
            docs, "doc_id", "n_tok", context_len=cap, n_shards=3
        ).collect()
    )
    shards = {}
    for s, d, *_ in got:
        shards.setdefault(s, []).append(d)
    want = []
    for s, ids in shards.items():
        win, used = 0, 0
        for d in sorted(ids):
            n = min(sizes[d], cap)
            if used + n > cap:
                win, used = win + 1, 0
            want.append((s, d, win, used))
            used += n
    assert got == sorted(want)
