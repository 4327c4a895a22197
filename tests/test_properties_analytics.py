"""Property-based tests for the closed-form analytics operators: random
inputs vs independent Python recursions. The Spark plans use window
algebra (prefix sums, bounded folds, bit interleaves); the simulators
use the literal sequential definitions — agreement over random data is
the proof the algebra is the recursion."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stream_sentinel_spark.operators.analytics import cusum, ewma
from stream_sentinel_spark.operators.partitioning import zorder_value

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# 2-decimal values, the cusum/ewma quantization contract
_values = st.lists(
    st.integers(min_value=0, max_value=50_000).map(lambda c: c / 100.0),
    min_size=1,
    max_size=60,
)


def _events(spark, vals):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 3, "v", base + dt.timedelta(seconds=i), v)
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )


@settings(**_SETTINGS)
@given(vals=_values, target=st.integers(0, 30_000), h=st.integers(1, 20_000))
def test_cusum_closed_form_is_the_recursion(spark, vals, target, h):
    target_, h_ = target / 100.0, h / 100.0
    out = {
        r["event_id"]: (round(r["cusum"], 2), r["alarm"])
        for r in cusum(
            _events(spark, vals), target=target_, threshold=h_
        ).collect()
    }
    state = {0: 0, 1: 0, 2: 0}  # scaled-integer recursion per user
    for i, v in enumerate(vals):
        u = i % 3
        state[u] = max(0, state[u] + round(v * 100) - target)
        assert out[i] == (state[u] / 100.0, state[u] > h)


@settings(**_SETTINGS)
@given(vals=_values, window=st.integers(1, 12))
def test_ewma_fold_is_the_truncated_definition(spark, vals, window):
    alpha = 0.25
    out = {
        r["event_id"]: (r["n_window"], r["ewma"])
        for r in ewma(
            _events(spark, vals), alpha=alpha, window=window
        ).collect()
    }
    hist: dict[int, list[float]] = {0: [], 1: [], 2: []}
    for i, v in enumerate(vals):
        u = i % 3
        hist[u].append(v)
        tail = hist[u][-window:]
        k = len(tail)
        ws = [(1 - alpha) ** (k - 1 - j) for j in range(k)]
        want = round(sum(x * w for x, w in zip(tail, ws)) / sum(ws), 6)
        n, got = out[i]
        assert n == k
        assert abs(got - want) <= 1e-6  # both round(…, 6); fold order may differ by 1 ulp pre-round


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)),
        min_size=1,
        max_size=40,
    )
)
def test_zorder_matches_bit_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    rows = df.select(
        "x", "y", zorder_value(F.col("x"), F.col("y"), bits=16).alias("z")
    ).collect()

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r["z"] == morton(r["x"], r["y"])
