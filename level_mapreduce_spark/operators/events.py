"""Event-stream relational operators over the ``events`` table —
the window/event-time capabilities the reference lacks entirely
(SURVEY §2.2: "window functions: absent", "streaming windows: absent"),
provided as engine extensions.

Decimal sums: event values aggregate as DECIMAL(18,2), not double —
decimal addition is associative, so results are identical under any
Spark partitioning/merge order AND match the DuckDB oracle exactly.
A double sum would be partition-order-dependent and unhashable.

All three operators express with built-in window/aggregate functions:
tumbling windows are a groupBy on ``date_trunc`` (shuffle on the
window+type key); running numbers and sessionization are SQL window
functions over ``(user_id)`` partitions — one shuffle each, and the
per-user partitions are naturally balanced (no whale users in this
schema; at 100 TB a skewed entity key would get AQE skew-join/salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type:
    (ws, event_type, n, total) — total as exact DECIMAL(18,2)."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("ws"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding (hopping) event-time windows per event_type: every
    event lands in ``window/slide`` overlapping windows (4 for
    1h/15min) — the trailing-window rate/revenue view tumbling
    windows can't express. Same output shape as
    :func:`windowed_counts`: (ws, event_type, n, total).

    Spark's ``window()`` generates the per-event window set inline
    (a generator, no self-join), then one shuffle on the
    (window, type) key — rows amplify by window/slide before the
    map-side partial agg, so keep the ratio modest at scale (4-8) or
    pre-aggregate to tumbling-slide-size buckets and roll up."""
    return (
        events.groupBy(
            F.window("ts", window, slide).alias("_w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        .select(F.col("_w.start").alias("ws"), "event_type", "n", "total")
    )


def running_number(events: DataFrame) -> DataFrame:
    """Per-user event sequence number in time order (deterministic
    tie-break on event_id): (event_id, user_id, rn)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.row_number().over(w).cast("long").alias("rn"),
    )


def sessionize(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle longer than ``gap_us``. (event_id, user_id, session_id) with
    session_id numbered per user from 1 — the batch equivalent of a
    streaming session window."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        us - F.lag(us).over(w) > gap_us, 1
    ).otherwise(0)
    return (
        events.withColumn("_new", new_session)
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            (
                F.sum("_new").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                + 1
            )
            .cast("long")
            .alias("session_id"),
        )
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes"
) -> DataFrame:
    """Per-session aggregates via Spark's native ``session_window``
    (the declarative dual of :func:`sessionize`'s per-event labels):
    one row per (user, session) with start/end bounds, event count,
    and exact decimal value total.

    ``session_window`` is a first-class groupBy key — Catalyst plans
    the gap-merge itself (one shuffle on user_id, sessions merged
    within partitions), and the SAME expression runs on a watermarked
    stream with state evicted when the watermark passes a session's
    close (streaming/windows.py::session_aggregates_stream). Session
    boundaries agree with :func:`sessionize` for equal gaps, including
    at the boundary itself: an event exactly ``gap`` after the previous
    one MERGES into the same session in both (verified on pyspark
    4.1.2 — session_window treats the window end ``last_ts + gap`` as
    inclusive for the merge, and sessionize splits only on a
    strictly-greater lag), so only ``diff > gap`` starts a new session.
    """
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("_w"), F.col("user_id")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n",
            "total",
        )
    )


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel progression per user: the furthest stage ``k``
    such that events of types ``stages[0..k-1]`` occur as a
    subsequence of the user's history in (ts, event_id) order —
    the classic conversion-funnel operator (view → click → purchase).

    Greedy earliest-match is exact for subsequence existence (taking
    the first eligible match never forecloses a longer match), so one
    pass over the per-user sorted event array suffices: a single
    shuffle on user_id, then a pure-Column ``aggregate`` fold — no
    UDF, no per-stage join cascade. Returns (user_id, stage) with
    stage in [0, len(stages)]; every user appears (stage 0 = never
    entered the funnel).

    Scale note: the per-user array is bounded by one user's event
    count. For whale entities that break that bound, reformulate as
    ``len(stages)`` sequential conditional-min aggregations (one
    shuffle per stage, no array) — the same greedy semantics; this
    array form is the fewer-shuffles default for human-scale keys.
    """
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").cast("long").alias("eid"),
                F.col("event_type").alias("et"),
            )
        )
    )
    stage_arr = F.array(*[F.lit(s) for s in stages])
    fold = F.aggregate(
        F.col("_evs"),
        F.lit(0),
        lambda acc, e: F.when(
            (acc < len(stages))
            & (e["et"] == F.element_at(stage_arr, acc + 1)),
            acc + 1,
        ).otherwise(acc),
    )
    return (
        events.groupBy(F.col("user_id").cast("long").alias("user_id"))
        .agg(evs.alias("_evs"))
        .select("user_id", fold.cast("long").alias("stage"))
    )


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles (p50/p95/p99) of event value per
    event_type — Spark's ``percentile`` is the same linear-interpolation
    definition as SQL ``quantile_cont``, so results are
    oracle-comparable bit-for-bit (unlike approx_percentile sketches).
    At 100 TB exact percentile is a sort-based aggregate per group; for
    firehose use swap in approx_percentile (t-digest, mergeable)."""
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


def approx_distinct_users(events: DataFrame) -> DataFrame:
    """HyperLogLog++ distinct-user sketch per event_type — the
    approximate/sketch operator family (rows-only check: HLL estimates
    are implementation-specific, so no cross-engine oracle). The exact
    twin (:func:`distinct_users`) is the oracle-checked accuracy
    reference; pytest bounds the sketch's relative error against it."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


def distinct_users(events: DataFrame) -> DataFrame:
    """Exact distinct users per event_type — the accuracy baseline for
    the HLL sketch (count_distinct = two-phase partial aggregation in
    Spark; at 100 TB prefer the sketch when ±2% suffices)."""
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )


def rolling_user_value(
    events: DataFrame, window_us: int = 3_600_000_000
) -> DataFrame:
    """Trailing time-window aggregate per user: for every event, the
    sum of that user's ``value`` over the preceding hour (inclusive)
    — the RANGE-frame window family (``rangeBetween`` over event-time
    micros), complementing the ROWS-frame running number.

    One shuffle on user_id; the frame is evaluated by Catalyst's
    sliding window-frame machinery per partition (no self-join, no
    explode). Cents-int output for cross-engine hash stability."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-window_us, 0)
    )
    # decimal-then-scale: a bare double*100 truncates (7.72*100 ->
    # 771.999...), the decimal cast is exact
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.sum(cents).over(w).alias("trailing_cents"),
    )
