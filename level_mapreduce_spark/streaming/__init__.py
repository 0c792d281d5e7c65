from level_mapreduce_spark.streaming.sink import stream_into

__all__ = ["stream_into"]
