"""Streaming relational operators — exactly-once event dedup and
stream-stream interval joins.

The reference engine's streaming surface is the detection pipeline only
(SURVEY §2: source → deser → keyBy → detect → alert); these extend the
engine with the two streaming-relational shapes every production event
pipeline needs next:

- **Streaming deduplication** — drop redelivered events (at-least-once
  sources redeliver on failover) by event id within the watermark
  horizon, so state stays bounded: Spark evicts a seen-id entry once
  the watermark passes it, giving exactly-once *output* semantics over
  an at-least-once *source* with O(ids-per-horizon) state, not
  O(all-ids-ever).
- **Stream-stream interval join** — correlate two event streams on a
  key within a bounded event-time interval (e.g. "click within 10
  minutes of the impression"). The time bound is what makes the join
  state finite: both sides are buffered only until the watermark
  clears the interval, the standard Structured Streaming pattern for
  unbounded-source joins.

Both are thin, opinionated wrappers over built-in Structured Streaming
operators — the engine-level value is the watermark/state-bound
contract they enforce (an unbounded variant is a production outage at
100 TB/day, not an option).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_sentinel_spark.streaming.sources import DEFAULT_WATERMARK


def dedup_events(
    events: DataFrame,
    id_cols: list[str],
    *,
    time_col: str = "ts",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Exactly-once event stream from an at-least-once source: keep the
    first delivery of each ``id_cols`` combination, dropping
    re-deliveries that arrive within the ``watermark`` horizon.

    Uses ``dropDuplicatesWithinWatermark`` so the seen-ids state is
    evicted as event time advances — the state bound is
    (ids arriving per watermark window), independent of stream length.
    The caller's watermark (from ``read_file_stream`` /
    ``parse_events``) is replaced by ``watermark`` on ``time_col`` to
    guarantee the column the dedup keys on is the watermarked one.

    On a batch DataFrame this degrades to plain ``dropDuplicates`` —
    the batch twin used by the parity tests.
    """
    if not events.isStreaming:
        return events.dropDuplicates(id_cols)
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_time: str = "ts",
    right_time: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = DEFAULT_WATERMARK,
    suffix: str = "_r",
) -> DataFrame:
    """Stream-stream inner join on ``key`` where the right event's time
    is within ``[left_time + lower, left_time + upper]`` (both bounds
    inclusive; ``lower`` may be negative e.g. ``"-5 minutes"``).

    Right-side columns are renamed with ``suffix`` (except the join
    key) so callers get a flat, collision-free schema.

    State bound: both sides buffer rows only while the other side's
    watermark can still produce a match inside the interval — Spark
    derives the eviction condition from the time-range predicate, so
    state is O(events per interval+watermark horizon) per key. Without
    the range predicate Spark would have to buffer both streams
    forever; this wrapper makes the bound non-optional.

    Works identically on batch DataFrames (the parity twin) — the time
    predicate is the same expression; only the state management
    differs.
    """
    renamed = [
        F.col(c).alias(c if c == key else f"{c}{suffix}") for c in right.columns
    ]
    if left.isStreaming:
        left = left.withWatermark(left_time, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_time, watermark)
    r = right.select(*renamed)
    rt = f"{right_time}{suffix}"
    cond = (
        (left[key] == r[key])
        & (F.col(rt) >= F.col(left_time) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rt) <= F.col(left_time) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(r, cond, "inner").drop(r[key])
