from level_mapreduce_spark.streaming.dedup import dedup_stream
from level_mapreduce_spark.streaming.joins import interval_join_stream
from level_mapreduce_spark.streaming.sink import (
    stream_into,
    stream_semdedup_into,
    stream_sketches_into,
)
from level_mapreduce_spark.streaming.stateful import sessionize_stream
from level_mapreduce_spark.streaming.windows import (
    session_aggregates_stream,
    windowed_counts_stream,
)

__all__ = [
    "dedup_stream",
    "interval_join_stream",
    "session_aggregates_stream",
    "sessionize_stream",
    "stream_into",
    "stream_semdedup_into",
    "stream_sketches_into",
    "windowed_counts_stream",
]
