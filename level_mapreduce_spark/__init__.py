"""level_mapreduce_spark — a PySpark-native stored-map (materialized view)
engine with the query and data-processing capabilities of
mikeal/level-mapreduce (reference: /root/reference/index.js), rebuilt
Spark-first.

Core abstraction (SURVEY.md §1): a *stored map index* — a user map
function ``doc -> [(key, value), ...]`` materialized into a sorted,
persistent, incrementally-maintained table, queried by key / prefix /
range with a lazy post-processing pipeline (map / filter / group).

The Spark realization is DataFrame-native throughout:

- index storage = Parquet segments range-laid-out by ``index_key``
  (LevelDB sort-order parity, reference index.js:118,137,236);
- incremental maintenance = LSM-style epoch segments + doc-key
  tombstones (the reference's meta reverse-index, index.js:182-205,
  232-242, folded into a ``doc_key`` provenance column);
- the query pipeline = Catalyst-fused DataFrame transformations
  (reference Query, index.js:13-94);
- live maintenance = Structured Streaming ``foreachBatch`` updates
  (:mod:`level_mapreduce_spark.streaming` — the reference is itself a
  change-stream sink, index.js:121,173);
- LLM-data-pipeline extensions (:mod:`level_mapreduce_spark.operators`):
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
  similarity search (brute cosine + hyperplane LSH), text analysis
  (quality stats, language-ID, inverted index, TF-IDF, winnowing
  fingerprints), multimodal binary-column plumbing.
"""

from level_mapreduce_spark.engine.index import MapIndex, list_indexes
from level_mapreduce_spark.engine.mapper import (
    AsyncPythonMapper,
    ExprMapper,
    PythonMapper,
    emit,
)
from level_mapreduce_spark.engine.query import Query
from level_mapreduce_spark.session import get_spark
from level_mapreduce_spark.streaming import stream_into

__all__ = [
    "AsyncPythonMapper",
    "ExprMapper",
    "MapIndex",
    "list_indexes",
    "PythonMapper",
    "Query",
    "emit",
    "get_spark",
    "stream_into",
]
