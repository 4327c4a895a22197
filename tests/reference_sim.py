"""A ~60-line Python interpreter of the reference's detector semantics,
written from the semantic description in SURVEY.md §2.4 (deque logic of
RateSpikeDetector.java:74-114 / StatisticalOutlierDetector.java:77-130 /
ThresholdDetector.java:46-78), with the event's own timestamp as the
time axis (SURVEY §7.4.3).

Used as the golden oracle for end-to-end parity tests: the Spark plan
must produce the identical alert set on any corpus.
"""

from __future__ import annotations

import math
from collections import defaultdict, deque
from decimal import Decimal, ROUND_HALF_UP


def _jfmt(x, nd):
    """Java ``String.format("%.<nd>f", double)``: HALF_UP rounding of the
    double's exact decimal expansion. Python's ``%`` operator rounds
    half-even and diverges on exact ties (e.g. -0.125 → Java "-0.13",
    Python "-0.12") — the reference is Java, so the oracle must round
    like Java (same contract as streaming/state.py _java_fmt)."""
    q = Decimal(1).scaleb(-nd) if nd > 0 else Decimal(1)
    return str(Decimal(float(x)).quantize(q, rounding=ROUND_HALF_UP))


def simulate(events, rules, key_field="userId"):
    """events: list of dicts with a ``ts`` datetime and arbitrary fields,
    pre-sorted in arrival order. Returns list of alert tuples
    (rule_name, key, ts, details, rule_index)."""
    # state[(key, rule_index)] → per-detector state
    rate_state = defaultdict(deque)
    stat_state = defaultdict(deque)
    alerts = []
    for ev in events:
        key = ev.get(key_field)
        key = "__unknown__" if key is None else str(key)
        for idx, rule in enumerate(rules):
            now_ms = int(ev["ts"].timestamp() * 1000)
            if rule.type == "threshold":
                v = _num(ev.get(rule.field))
                if v is not None and v > rule.threshold:
                    details = "Threshold exceeded: %s=%s (threshold: %s)" % (
                        rule.field, _jfmt(v, 2), _jfmt(rule.threshold, 2))
                    alerts.append((rule.name, key, ev["ts"], details, idx))
            elif rule.type == "rate":
                dq = rate_state[(key, idx)]
                start = now_ms - rule.window_seconds * 1000
                while dq and dq[0] < start:
                    dq.popleft()
                dq.append(now_ms)
                if len(dq) > rule.threshold:
                    details = "Rate spike: %d events in %d seconds (threshold: %s)" % (
                        len(dq), rule.window_seconds, _jfmt(rule.threshold, 0))
                    alerts.append((rule.name, key, ev["ts"], details, idx))
            elif rule.type == "statistical":
                v = _num(ev.get(rule.field))
                if v is None:
                    continue
                dq = stat_state[(key, idx)]
                if len(dq) >= 2:
                    mean = sum(dq) / len(dq)
                    sd = math.sqrt(sum((x - mean) ** 2 for x in dq) / len(dq))
                    bound = 0.0 if sd == 0 else rule.deviation_factor * sd
                    if abs(v - mean) > bound:
                        details = (
                            "Statistical outlier: %s=%s (mean=%s, stddev=%s, factor=%s)"
                            % (rule.field, _jfmt(v, 2), _jfmt(mean, 2),
                               _jfmt(sd, 2), _jfmt(rule.deviation_factor, 1))
                        )
                        alerts.append((rule.name, key, ev["ts"], details, idx))
                dq.append(v)
                while len(dq) > rule.window_size:
                    dq.popleft()
    return sorted(alerts, key=lambda a: (a[1], a[2], a[4]))


def _num(value):
    if value is None or isinstance(value, bool):
        return None
    try:
        return float(value)
    except (TypeError, ValueError):
        return None
