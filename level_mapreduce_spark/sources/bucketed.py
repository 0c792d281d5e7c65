"""Bucketed tables — shuffle-free co-located joins and aggregations.

The reference gets physical co-location for free: LevelDB stores one
sorted keyspace, so everything about a key is adjacent (index.js:113,
124-138). Spark's equivalent for JOIN workloads is bucketing: rows are
hash-partitioned into a fixed number of buckets BY KEY AT WRITE TIME
(and optionally sorted within each bucket), so any later equi-join or
aggregation on the bucket key reads pre-shuffled — the Exchange
disappears from the plan.

At 100 TB this is the difference between re-shuffling a fact table on
every join (network-bound, the dominant cost of a big SortMergeJoin)
and a scan-local join: two tables bucketed by the same key into the
same bucket count join bucket-to-bucket with NO data movement, and
``sortBy`` within buckets removes the per-task sort too. The write
pays one shuffle, every subsequent query skips it — the same
amortization argument as the MapIndex sorted-segment store, applied to
the relational side of the engine.

Practical rules (encoded in the helper):

- both join sides must use the SAME bucket count (Spark joins
  bucketed x bucketed only when counts match, or one divides the
  other with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- pick bucket count so a bucket of the BIG table fits an executor
  task comfortably (128-256 MB of parquet per bucket is the usual
  target); at local[32] test scale that is simply >= the parallelism;
- bucket pruning: an equality predicate on the bucket key scans ONE
  bucket (``spark.sql.sources.bucketing.enabled`` on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: str | list[str],
    n_buckets: int,
    sort_by: str | list[str] | None = None,
    path: str | None = None,
) -> DataFrame:
    """Persist ``df`` as a parquet table bucketed by ``keys`` into
    ``n_buckets`` (optionally sorted within buckets by ``sort_by``)
    and return the re-read table.

    Joins/aggregations between tables written with the same keys and
    bucket count plan WITHOUT an Exchange on the bucketed side(s) —
    assert it with ``.explain()``; tests/test_bucketed.py does.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *key_list)
    )
    if sort_by is not None:
        sort_list = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sort_list)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return df.sparkSession.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    """Drop a bucketed table registration (data under an explicit
    ``path`` survives; managed data is deleted with the table)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
