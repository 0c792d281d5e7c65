"""Custom stateful streaming operator: gap-based sessionization with
persistent per-user state via ``applyInPandasWithState``.

The batch operator (:func:`..operators.events.sessionize`) numbers
sessions with a SQL window — fine when all of a user's history is in
one dataset. On an unbounded stream, history is unbounded; the
streaming form keeps O(1) state per user (last event time + running
session number) in the state store and assigns session ids
incrementally as micro-batches arrive — state the size of the user
population, not the event history.

This is the engine's ``applyInPandasWithState`` surface: grouped
Arrow batches + a typed GroupState, the Spark-native replacement for
the reference's per-key durable state pattern (its meta reverse index,
index.js:182-205) generalized to arbitrary per-key logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes (batch operator parity)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("session_id", T.LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """(event_id, user_id, session_id) with sessions numbered per user
    from 1, continuing across micro-batches.

    Within a micro-batch events are processed in (ts, event_id) order;
    across batches the state carries (last event time, current session
    number). Equivalent to the batch ``sessionize`` whenever batches
    arrive in event-time order (asserted in tests by replaying the
    events table file-by-file).
    """

    def assign(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_us, session_id = state.get
        else:
            last_us, session_id = None, 0
        out_ids, out_sessions = [], []
        # Concatenate the group's chunks BEFORE sorting: the iterator
        # delivers a user's micro-batch rows as multiple Arrow chunks
        # (maxRecordsPerBatch), and chunk-local sorts would process
        # later-timestamp rows before earlier ones across a chunk
        # boundary — suppressing real session breaks (or inventing
        # spurious ones) and persisting the wrong numbering into
        # state. Memory is bounded by one user's events per
        # micro-batch, the same bound the state model already assumes.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if not pdf.empty:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, event_id in zip(pdf["ts"], pdf["event_id"]):
                us = int(pd.Timestamp(ts).value) // 1000
                if last_us is None or us - last_us > gap_us:
                    session_id += 1
                last_us = us
                out_ids.append(int(event_id))
                out_sessions.append(session_id)
        state.update((last_us, session_id))
        yield pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": int(user_id),
                "session_id": out_sessions,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
