"""Stream-stream joins — the last Structured Streaming surface the
reference lacks (SURVEY §2.2 "joins: absent"; its nearest relative,
index chaining, is composition, not a join), provided as a
Spark-native extension.

The canonical shape is event attribution: a stream of clicks joined to
a stream of purchases by user within a time window. Spark's
stream-stream inner join buffers BOTH sides in state; without bounds
that state grows forever. Two things bound it, and both are mandatory
here:

1. a watermark on each side (how late either stream may arrive), and
2. a time-range join condition tying the two event times together.

From those Spark derives a state watermark — a left click is dropped
from state once no future right row inside the interval can still
arrive (left watermark + interval), and symmetrically for the right.
Live state is then O(rate x (watermark + interval)) per side,
independent of stream lifetime — the property that makes this run
forever at firehose rates.

On a closed input (availableNow replay) the inner join converges to
exactly :func:`..operators.joins.interval_join` — the batch twin the
tests compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Streaming keyed interval join: each right event matches every
    left event with the same ``on`` key at most ``within`` before it.

    Both inputs must be streaming DataFrames with event-time column
    ``ts``. Output schema matches the batch
    :func:`..operators.joins.interval_join`: all left columns plus
    right columns prefixed ``right_prefix``.

    ``how``: ``inner`` (default) or ``leftOuter`` — the outer form
    emits an unmatched left row (right columns null) only once the
    watermark proves no match can still arrive, so null-matches are
    late by the watermark delay but never wrong (no retraction).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(
            f"interval_join_stream supports inner/leftOuter, got {how!r}"
        )
    rcols = [c for c in right.columns if c != on]
    l_w = left.withWatermark(ts, watermark)
    # rename BEFORE declaring the watermark — declaring it twice
    # (pre- and post-rename) is a redefinition error in Spark 4
    r_w = right.select(
        F.col(on),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    ).withWatermark(f"{right_prefix}{ts}", watermark)
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_prefix}{ts}") >= F.col(f"l.{ts}"))
        & (
            F.col(f"r.{right_prefix}{ts}")
            <= F.col(f"l.{ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    joined = l_w.alias("l").join(r_w.alias("r"), cond, how)
    out = [F.col(f"l.{c}") for c in left.columns]
    out += [F.col(f"r.{right_prefix}{c}") for c in rcols]
    return joined.select(*out)
