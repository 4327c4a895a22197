"""Property-based test for dedup.containment_pairs: random corpora vs a
literal pure-Python reference implementing the declared semantics
(rank-cutoff rare blocking over the shingle-df table, min-size floor,
containment over the blocked universe). The operator routes through two
physical strategies chosen by probes (set-classes vs asymmetric prefix
filtering); random corpora exercise both plus every gate edge — this is
the guard the crafted-input tests and the fixture-bound oracle can't
give for arbitrary inputs."""

from __future__ import annotations

import pytest

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stream_sentinel_spark.operators.dedup import containment_pairs

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# Small alphabet + short texts force heavy shingle sharing (both
# regimes and every df tie case); duplicate texts force class
# compression; sub-3-char texts hit the short-doc gate.
_texts = st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=14),
    min_size=2,
    max_size=24,
)


def _reference(texts, n, threshold, rare_frac, min_size):
    """Literal sequential implementation of the declared semantics."""
    sets = {}
    for i, t in enumerate(texts):
        if len(t) < n:
            continue
        g = {t[j : j + n] for j in range(len(t) - n + 1)}
        if g:
            sets[i] = g
    df = {}
    for g in sets.values():
        for s in g:
            df[s] = df.get(s, 0) + 1
    if not df:
        return set()
    dfs = sorted(df.values())
    pos = max(1, math.ceil(rare_frac * len(dfs)))
    cap = dfs[pos - 1]
    rare = {s for s, d in df.items() if d <= cap}
    blocked = {
        i: g & rare
        for i, g in sets.items()
        if len(g & rare) >= max(min_size, 1)
    }
    out = set()
    ids = sorted(blocked)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = len(blocked[a] & blocked[b])
            if shared == 0:
                continue
            mn = min(len(blocked[a]), len(blocked[b]))
            if shared / mn >= threshold:
                out.add(
                    (a, b, shared, len(blocked[a]), len(blocked[b]), shared / mn)
                )
    return out


# slow tier: hypothesis sweep; containment correctness runs at default size in test_containment
@pytest.mark.slow
@settings(**_SETTINGS)
@given(
    texts=_texts,
    rare_frac=st.sampled_from([0.2, 0.5, 1.0]),
    min_size=st.sampled_from([1, 3]),
    threshold=st.sampled_from([0.5, 0.9]),
)
def test_containment_matches_sequential_reference(
    spark, texts, rare_frac, min_size, threshold
):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.a_id, r.b_id, r.shared, r.a_sz, r.b_sz, r.containment)
        for r in containment_pairs(
            df, "doc_id", "text", n=3,
            threshold=threshold, rare_frac=rare_frac, min_size=min_size,
        ).collect()
    }
    want = _reference(texts, 3, threshold, rare_frac, min_size)
    assert got == want
