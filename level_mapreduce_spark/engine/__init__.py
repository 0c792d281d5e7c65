from level_mapreduce_spark.engine.index import MapIndex
from level_mapreduce_spark.engine.mapper import (
    AsyncPythonMapper,
    ExprMapper,
    PythonMapper,
    emit,
)
from level_mapreduce_spark.engine.query import Query

__all__ = [
    "AsyncPythonMapper",
    "ExprMapper",
    "MapIndex",
    "PythonMapper",
    "Query",
    "emit",
]
