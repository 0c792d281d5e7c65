"""Event-time streaming aggregation with watermarks — the streaming
window surface the reference lacks entirely (SURVEY §2.2 "streaming
windows: absent"), provided as a Spark-native extension.

These wrap the batch operators in :mod:`..operators.events` for
streaming input: the same logical aggregation, plus watermark-driven
state eviction so unbounded streams run in bounded state — the property
that matters when the events table is a firehose, not a file.

State sizing at scale: tumbling-window counts keep one state row per
(window, event_type) until the watermark passes the window end; with
1-hour windows and a 30-minute watermark that is ~2 windows of live
state per key — independent of input rate. Late rows inside the
watermark update their window; later ones are dropped (counted by the
`numRowsDroppedByWatermark` metric, queryable off `lastProgress`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts_stream(
    events: DataFrame,
    watermark: str = "30 minutes",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Streaming tumbling — or, with ``slide``, hopping — event-time
    windows per event_type: (ws, event_type, n, total) — the
    streaming form of ``operators.events.windowed_counts`` /
    ``sliding_counts`` (same output schema; ``ws`` is the window
    start).

    In append output mode a window emits exactly once, when the
    watermark passes its end — the exactly-once-per-window contract a
    downstream MapIndex ``update()`` wants (each emitted row becomes
    part of one micro-batch epoch). With ``slide``, live state holds
    ``window/slide`` overlapping windows per key until the watermark
    passes each — still rate-independent, scaled by that ratio.
    """
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            w.alias("_w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        .select(
            F.col("_w.start").alias("ws"),
            "event_type",
            "n",
            "total",
        )
    )


def session_aggregates_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming session windows via the native ``session_window``
    groupBy key — the same logical aggregation as
    ``operators.events.session_aggregates`` (same output schema).

    State: one open session per active user, merged as events arrive,
    emitted (append mode) and evicted once the watermark passes the
    session close — bounded by ACTIVE users in the gap+watermark
    horizon, not by stream lifetime. This is the declarative twin of
    the ``applyInPandasWithState`` sessionizer in ``stateful.py``:
    prefer this one unless per-event custom state logic is needed.
    """
    from level_mapreduce_spark.operators.events import session_aggregates

    return session_aggregates(
        events.withWatermark("ts", watermark), gap
    )
