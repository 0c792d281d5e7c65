from level_mapreduce_spark.sources.bucketed import drop_bucketed, write_bucketed
from level_mapreduce_spark.sources.jsonl import read_jsonl, write_jsonl
from level_mapreduce_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "TABLES",
    "drop_bucketed",
    "load_table",
    "load_tables",
    "read_jsonl",
    "write_bucketed",
    "write_jsonl",
]
