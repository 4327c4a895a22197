"""Grouped time-window aggregations — engine extensions (SURVEY §2.5 T5).

The reference has no tumbling/sliding/session windows (its only
windowing is the per-event frames W1/W2); these come free with Spark and
are part of the engine's declared batch/streaming surface. Batch uses
the same `window()`/`session_window()` expressions as streaming, so one
codepath serves both (with watermarks attached in streaming mode).

Scale: both compile to a single hash aggregation keyed by
(key, window) — one shuffle, map-side partial aggregation, AQE-coalesced.
Session windows additionally merge overlapping sessions inside the
aggregation (no self-join, unlike the naive gaps-and-islands SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    key: Column,
    time_col: str,
    duration: str,
    value_col: str | None = None,
) -> DataFrame:
    """Per-key tumbling-window count (+ optional exact decimal sum).

    Output: key, window_start_ms, window_end_ms, n (+ sum_value).
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return (
        df.groupBy(key.alias("k"), F.window(time_col, duration).alias("w"))
        .agg(*aggs)
        .select(
            "k",
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
            *(["n"] if value_col is None else ["n", "sum_value"]),
        )
    )


def sliding_counts(
    df: DataFrame,
    key: Column,
    time_col: str,
    duration: str,
    slide: str,
) -> DataFrame:
    """Per-key sliding-window count: each event lands in
    ``duration/slide`` overlapping windows. Spark's ``window(d, s)``
    assigns rows to every overlapping window inside one aggregation —
    the explode is implicit and the plan is still a single hash
    aggregation keyed by (key, window).

    Output: key, window_start_ms, window_end_ms, n.
    """
    return (
        df.groupBy(key.alias("k"), F.window(time_col, duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "k",
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            F.unix_millis(F.col("w.end")).alias("window_end_ms"),
            "n",
        )
    )


def session_windows(
    df: DataFrame,
    key: Column,
    time_col: str,
    gap: str,
) -> DataFrame:
    """Per-key session windows: events closer than ``gap`` chain into one
    session (`session_window` — merge-on-aggregate, single shuffle).

    Output: key, session_start_ms, session_end_ms, n_events.
    Note: `session_window`'s end is last-event-time + gap (the session's
    expiry instant, which is what streaming emits on watermark pass).
    """
    return (
        df.groupBy(key.alias("k"), F.session_window(time_col, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "k",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
        )
    )
