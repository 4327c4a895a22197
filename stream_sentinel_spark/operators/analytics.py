"""Event-log analytics: ordered funnels, retention cohorts, transition
matrices, and windowed exponential moving averages.

The reference engine's surface is per-key anomaly detection over an
event stream (SURVEY §2); production deployments of that shape (fraud /
abuse pipelines) invariably sit next to product-analytics queries over
the same event log. This module adds the four canonical ones as batch
operators over the ``events`` table, each expressed so the plan is one
hash shuffle on the entity key plus cheap follow-on aggregation — the
shape that scales: at 100 TB the per-user work is a single exchange,
all subsequent window frames reuse that partitioning (Catalyst emits
one Exchange for consecutive windows over the same partition key), and
the final roll-ups group on low-cardinality keys.

Cross-engine determinism: counts and integer week arithmetic are exact;
the only doubles compared are single divisions of exact integers
(transition probabilities) or short fixed-order weighted sums rounded
to 6 decimals (EWMA) — see the corpus entries for the DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MS_PER_WEEK = 7 * 86_400_000


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: how many users reached step k having
    completed steps 1..k-1 in strictly increasing event time.

    Step k's entry timestamp is ``min(ts | type = steps[k] and ts >
    t_{k-1})`` — the classic "first qualifying event after the previous
    step" semantics (each step must happen strictly AFTER the previous
    one; simultaneous events do not chain).

    Plan shape: ONE shuffle. Every step timestamp is a conditional
    ``min`` over the same ``Window.partitionBy(user)`` — consecutive
    window functions over one partitioning collapse into a single
    Exchange + one Window node, so adding funnel steps adds zero
    shuffles. The final roll-up aggregates |steps| counters map-side
    into a single row per step. No joins, no per-step scans: at 100 TB
    this reads the event log exactly once.

    Returns one row per step: (step int, event_type, users bigint),
    monotonically non-increasing in ``users``.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    w = Window.partitionBy(user_col)
    df = events
    prev: Column | None = None
    for i, step in enumerate(steps):
        qualifies = F.col(type_col) == F.lit(step)
        if prev is not None:
            qualifies = qualifies & (F.col(time_col) > prev)
        t_k = F.min(F.when(qualifies, F.col(time_col))).over(w)
        df = df.withColumn(f"_t{i}", t_k)
        prev = F.col(f"_t{i}")
    # one surviving row per user is enough to count reach; the window
    # frame already replicated _t* to every row of the user.
    per_user = df.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(steps))]
    )
    counters = per_user.agg(
        *[
            F.count(F.col(f"_t{i}")).alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"_n{i}").alias("users"),
        )
        for i, step in enumerate(steps)
    ]
    return counters.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.step", "r.event_type", "r.users")


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-seen week
    (cohort), counted in every subsequent week they were active.

    Weeks are integer epoch-week ordinals (``floor(epoch_ms / 1 week)``)
    — timezone-proof and engine-exact; no calendar truncation.

    Plan shape: ONE shuffle over the event log — a per-user
    ``collect_set`` of active weeks (map-side combined, so each mapper
    ships at most |weeks-in-corpus| ordinals per user, a time-bounded
    constant — ~52/year — not the user's event count), then the cohort
    is ``array_min`` and the triangle re-explodes the dedup'd weeks
    into a roll-up on the tiny (cohort_week, week_offset) key. The
    textbook formulation self-joins activity against first-activity;
    this form never shuffles the activity frame a second time.

    Returns (cohort_week bigint, week_offset bigint, users bigint);
    week_offset 0 rows carry the cohort sizes.
    """
    week = F.floor(F.unix_millis(F.col(time_col)) / F.lit(_MS_PER_WEEK))
    per_user = (
        events.select(F.col(user_col).alias("user"), week.alias("week"))
        .groupBy("user")
        .agg(F.collect_set("week").alias("weeks"))
    )
    return (
        per_user.select(
            F.array_min("weeks").alias("cohort_week"),
            F.explode("weeks").alias("week"),
        )
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    for each ordered pair (src → dst of the NEXT event by the same
    user), its count and row-normalized probability.

    Plan shape: one shuffle for the per-user ``lead`` window, a hash
    aggregation on the (|types|²)-cardinality pair key, and a window
    ``sum`` over src for the normalizer — the last two touch only the
    tiny aggregated frame. Probability is one IEEE division of two
    exact integers, so the value is bit-identical on any engine.

    Returns (src_type, dst_type, n bigint, prob double).
    """
    w = Window.partitionBy(user_col).orderBy(time_col, *order_cols)
    pairs = (
        events.withColumn("_dst", F.lead(type_col).over(w))
        .filter(F.col("_dst").isNotNull())
        .groupBy(F.col(type_col).alias("src_type"), F.col("_dst").alias("dst_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy("src_type")
    return pairs.withColumn(
        "prob", F.col("n") / F.sum("n").over(total)
    )


def collapse_runs(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Consecutive-duplicate compaction report: per key, how many events
    repeat the PREVIOUS event's type (a "run" continuation) vs start a
    new run. Keep-first-of-run is the classic telemetry/CDC compaction
    — heartbeats, repeated status posts, duplicated sensor readings —
    where only transitions carry information; this operator measures
    exactly what that compaction would drop, per key.

    An event is collapsed iff ``lag(type) over (key order by time,
    order_cols) = type`` — NULL-lag (the key's first event) never
    compares equal, so every key keeps ≥1 event. Deterministic given a
    unique (time, order_cols) ordering per key.

    Plan: ONE shuffle for the per-key lag window, then a hash-agg on
    the same key — AQE reuses the partitioning, so the agg is
    exchange-free. Scales as a keyed sort, no driver state.

    Returns (user_col, n_events, n_collapsed, n_kept).
    """
    w = Window.partitionBy(user_col).orderBy(time_col, *order_cols)
    is_dup = F.when(
        F.lag(type_col).over(w) == F.col(type_col), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_dup", is_dup)
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_dup").alias("n_collapsed"),
            (F.count(F.lit(1)) - F.sum("_dup")).alias("n_kept"),
        )
    )


def ewma(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    time_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    alpha: float = 0.25,
    window: int = 8,
) -> DataFrame:
    """Windowed exponential moving average of ``value_col`` per user:
    over the last ``window`` events (ROWS frame), a weighted mean with
    geometric weights ``(1-alpha)^age`` (newest event weight 1,
    normalized by the weight sum) — the truncated-EWMA every metrics
    store ships (exact EWMA has an unbounded frame; truncating at k
    events bounds both state and the error term by ``(1-alpha)^k``).

    Plan shape: one shuffle on the user key; ``collect_list`` over the
    bounded ROWS frame keeps ≤ ``window`` doubles per row, and the
    weighted fold runs inside codegen via ``aggregate`` over the
    zipped (value, age) array — no UDF. The frame is oldest→newest, so
    the fold's addition order is fixed and engine-independent; the
    compared value still rounds to 6 decimals to absorb last-ulp
    ``pow`` differences across libm builds.

    Returns the input keys plus (n_window int, ewma double).
    """
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    frame = (
        Window.partitionBy(user_col)
        .orderBy(time_col, *order_cols)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.collect_list(F.col(value_col).cast("double")).over(frame)
    df = events.withColumn("_arr", arr)
    k = F.size("_arr")
    # age of element i (1-based, oldest first) is k - i
    ages = F.sequence(k - F.lit(1), F.lit(0), F.lit(-1))
    decay = F.lit(1.0 - alpha)
    weighted = F.zip_with(
        "_arr", ages, lambda v, age: v * F.pow(decay, age.cast("double"))
    )
    weights = F.transform(ages, lambda age: F.pow(decay, age.cast("double")))
    fold = lambda col: F.aggregate(  # noqa: E731 — local plan fragment
        col, F.lit(0.0), lambda acc, x: acc + x
    )
    return df.select(
        *[F.col(c) for c in (user_col, time_col, *order_cols)],
        k.alias("n_window"),
        F.round(fold(weighted) / fold(weights), 6).alias("ewma"),
    )


_MS_PER_HOUR = 3_600_000


def resample_fill(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    time_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    bucket_ms: int = _MS_PER_HOUR,
) -> DataFrame:
    """Regularize an irregular per-user series onto a fixed grid with
    carry-forward fill: one row per (user, bucket) from the user's
    first to last active bucket, carrying the user's last observed
    value into silent buckets (the resample → ffill idiom).

    Plan shape: ONE corpus shuffle — the (user, bucket) last-observation
    aggregation (``max_by`` keeps the in-bucket latest without a window
    over raw events). The dense grid comes from a per-user
    ``sequence``/``explode`` over the AGGREGATED frame (grid size is
    span/bucket per user — time-bounded, never event-bounded), the
    observations join back on the same (user, bucket) key, and the
    carry-forward is an ignore-nulls ``last`` over the user
    partitioning of the grid frame. The grid explode deliberately
    happens AFTER aggregation: a per-raw-event grid would multiply the
    corpus by the span.

    Returns (user, bucket_ms bigint, value double, is_gap boolean).
    """
    bucket = (
        F.floor(F.unix_millis(F.col(time_col)) / F.lit(bucket_ms))
    ).alias("bucket")
    order_key = F.struct(
        F.unix_millis(F.col(time_col)).alias("t"),
        *[F.col(c) for c in order_cols],
    )
    obs = (
        events.select(
            F.col(user_col).alias("user"), bucket,
            F.col(value_col).cast("double").alias("v"),
            order_key.alias("ok"),
        )
        .groupBy("user", "bucket")
        .agg(F.max_by("v", "ok").alias("v"))
    )
    span = obs.groupBy("user").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        "user", F.explode(F.sequence("lo", "hi")).alias("bucket")
    )
    w = (
        Window.partitionBy("user")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["user", "bucket"], "left")
        .select(
            "user",
            (F.col("bucket") * F.lit(bucket_ms)).alias("bucket_ms"),
            F.last("v", ignorenulls=True).over(w).alias("value"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


def cusum(
    events: DataFrame,
    target: float,
    threshold: float,
    value_col: str = "value",
    user_col: str = "user_id",
    time_col: str = "ts",
    order_cols: Sequence[str] = ("event_id",),
    decimal_scale: int = 2,
) -> DataFrame:
    """One-sided CUSUM drift detector per user: the classic clamped
    recursion ``s_i = max(0, s_{i-1} + (x_i − target))``, alarm when
    ``s_i > threshold`` (Page 1954 — the drift detector the reference's
    threshold/statistical rules don't cover: it accumulates SMALL
    persistent shifts that never trip a per-event threshold).

    The recursion looks inherently sequential, but it has the closed
    form ``s_i = r_i − min(r_0..r_i)`` over the prefix sums
    ``r_i = Σ(x_k − target)`` (with r_0 = 0) — two CHAINED window
    aggregates over one user partitioning: a running sum then a
    running min. No UDF, no iteration, one shuffle.

    All accumulation runs in INTEGERS scaled by ``10^decimal_scale``
    (values are quantized to that scale on entry, matching the
    reference's exact-decimal detector semantics — see
    operators/statistical.py). Integer prefix sums are exact on every
    engine — decimal window sums are NOT portable (DuckDB's windowed
    DECIMAL SUM accumulates in double) — so the emitted double and the
    alarm flag are bit-identical with no rounding guard.

    Returns the input keys plus (cusum double, alarm boolean).
    """
    scale = float(10 ** decimal_scale)
    t_scaled = int(round(target * scale))
    h_scaled = int(round(threshold * scale))
    w = Window.partitionBy(user_col).orderBy(time_col, *order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    x = F.round(F.col(value_col) * F.lit(scale), 0).cast("long")
    r = F.sum(x - F.lit(t_scaled)).over(run)
    df = events.withColumn("_r", r)
    # r_0 = 0 enters the prefix-min as least(min(r), 0)
    low = F.least(F.min("_r").over(run), F.lit(0).cast("long"))
    df = df.withColumn("_s", F.col("_r") - low)
    return df.select(
        *[F.col(c) for c in (user_col, time_col, *order_cols)],
        F.col(value_col),
        (F.col("_s").cast("double") / F.lit(scale)).alias("cusum"),
        (F.col("_s") > F.lit(h_scaled)).alias("alarm"),
    )


def linear_trend(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    time_col: str = "ts",
    bucket_ms: int = _MS_PER_HOUR,
    decimal_scale: int = 2,
) -> DataFrame:
    """Per-key least-squares trend of ``value_col`` over time: slope and
    intercept of the OLS line through (bucket-offset, value) — the
    screening regression behind "which keys are drifting and how fast"
    (CUSUM's :func:`cusum` answers WHEN a drift started; this ranks
    keys by drift RATE).

    Exactness: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
    accumulate in DECIMAL(38,0) — exact and order-insensitive on any
    engine (the HUGEINT mirror in the oracle), with the 38-digit
    budget covering raw epoch buckets times decimal(18,s) values
    (int64 accumulators overflowed on large values: x·y ~ 5e21 at
    epoch-hour × 1e16 cents). The final slope/intercept are divisions
    taken in double precision — exact for all realistic magnitudes
    (< 2^53), and the only non-integer step.

    Plan shape: one hash aggregation per key computing the statistics
    (map-side combined; the per-key state is five longs however many
    events the key has), then scalar arithmetic. The x offset needs the
    key's min bucket, which rides in the same aggregation (min) — the
    offset is applied algebraically AFTER aggregation (shift x by a
    constant changes only the intercept: slope is shift-invariant, and
    intercept_at_min = mean_y − slope·mean_x_shifted), so ONE pass
    suffices, not a min-then-rescan.

    Returns (user, n bigint, slope double — value units per bucket,
    intercept double — fitted value at the key's first bucket); keys
    with a single bucket or zero x-variance emit slope 0.0.
    """
    p = 10**decimal_scale
    dec = "decimal(38,0)"
    bucket = F.floor(F.unix_millis(F.col(time_col)) / F.lit(bucket_ms))
    cents = (F.col(value_col).cast(f"decimal(18,{decimal_scale})") * p).cast(
        "long"
    )
    per_key = (
        events.select(
            F.col(user_col).alias("user"),
            bucket.alias("x"),
            cents.alias("y"),
        )
        .groupBy("user")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x0"),
            F.sum(F.col("x").cast(dec)).alias("sx"),
            F.sum(F.col("y").cast(dec)).alias("sy"),
            F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        )
    )
    # shift x by x0 algebraically: with u = x - x0,
    #   Σu   = sx - n·x0
    #   Σu²  = sxx - 2·x0·sx + n·x0²
    #   Σuy  = sxy - x0·sy
    dec_of = lambda c: c.cast(dec)  # noqa: E731 — local plan fragment
    n_, x0 = dec_of(F.col("n")), dec_of(F.col("x0"))
    su = F.col("sx") - n_ * x0
    suu = F.col("sxx") - 2 * x0 * F.col("sx") + n_ * x0 * x0
    suy = F.col("sxy") - x0 * F.col("sy")
    det = (n_ * suu - su * su).cast("double")
    slope_scaled = F.when(
        det != 0,
        (n_ * suy - su * F.col("sy")).cast("double") / det,
    ).otherwise(F.lit(0.0))
    return per_key.select(
        "user",
        "n",
        F.round(slope_scaled / p, 6).alias("slope"),
        F.round(
            (
                F.col("sy").cast("double") / F.col("n")
                - slope_scaled * (su.cast("double") / F.col("n"))
            )
            / p,
            6,
        ).alias("intercept"),
    )


def robust_outliers(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    order_col: str = "event_id",
    k: float = 3.0,
    consistency: float = 1.4826,
    round_to: int = 6,
) -> DataFrame:
    """Per-key robust outlier report via median / MAD (median absolute
    deviation) — the screening companion to the mean/σ statistical
    detector (`operators/statistical.py`): a z-score's mean and σ are
    themselves dragged by the outliers they're meant to flag, while the
    median/MAD pair has a 50% breakdown point (Hampel's rule; the
    ``consistency`` factor 1.4826 rescales MAD to σ under normality).

    Medians are EXACT and rank-based — the middle element(s) by the
    total order (value ASC, ``order_col`` ASC), averaged when the count
    is even. The tie-break makes row_number deterministic, and "avg of
    at most two doubles" is order-insensitive, so both engines compute
    identical medians bit-for-bit — no interpolating percentile
    implementation is trusted to agree cross-engine. NULL values are
    excluded up front (engines disagree on NULL sort placement).

    A row is an outlier when |v − median| > k · consistency · MAD,
    computed from bit-identical doubles on both sides, so the strict
    comparison agrees even at near-threshold values. MAD = 0 (> half
    the key's values identical) flags every deviating row — the
    conventional degenerate-regime reading.

    Plan shape: two rank windows per key (one sort each) + two
    broadcast joins of the per-key scalars. Exact per-key medians
    require a per-key total order; for the LOW-cardinality keys here
    (5 event types) each window is one fat sorted partition — the
    honest cost of exactness. At 100 TB cardinality-5 keys, switch to
    ``approx_percentile`` (documented approx regime, same report
    shape) or a two-pass histogram selection; for high-cardinality
    keys (user_id) the sorts are ordinary balanced keyed windows and
    this exact form scales as-is.

    Returns (key, n_events, median_value, mad, n_outliers).
    """
    base = (
        events.filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col).alias("_k"),
            F.col(order_col).alias("_oid"),
            F.col(value_col).alias("_v"),
        )
    )
    w_all = Window.partitionBy("_k")

    def middle_avg(frame: DataFrame, col: str, out: str) -> DataFrame:
        w_rank = Window.partitionBy("_k").orderBy(F.asc(col), F.asc("_oid"))
        ranked = frame.select(
            "_k",
            F.col(col),
            F.row_number().over(w_rank).alias("_rn"),
            F.count(F.lit(1)).over(w_all).alias("_n"),
        )
        return (
            ranked.filter(
                (F.col("_rn") == F.expr("(_n+1) DIV 2"))
                | (F.col("_rn") == F.expr("(_n+2) DIV 2"))
            )
            .groupBy("_k")
            .agg(F.avg(col).alias(out))
        )

    med = middle_avg(base, "_v", "_med")
    dev = base.join(F.broadcast(med), "_k").select(
        "_k", "_oid", "_med", F.abs(F.col("_v") - F.col("_med")).alias("_dev")
    )
    mad = middle_avg(dev, "_dev", "_mad")
    return (
        dev.join(F.broadcast(mad), "_k")
        .groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("_med"), round_to).alias("median_value"),
            F.round(F.min("_mad"), round_to).alias("mad"),
            F.sum(
                (
                    F.col("_dev") > F.lit(k) * F.lit(consistency) * F.col("_mad")
                ).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            F.col("_k").alias(key_col), "n_events", "median_value", "mad", "n_outliers"
        )
    )
