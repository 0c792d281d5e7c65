"""Sources — the driver-generated Parquet star schema (TESTDATA.md).

These tables stand in for the reference's document source: any
object-mode stream of ``{key, value[, deleted]}`` records
(reference index.js:173-180; the ``couchup`` dependency signals a
CouchDB-style changes feed, package.json:11). ``kv_documents`` recasts
any table into that shape.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table.

    ``events.ts`` has drifted across testdata generations: Parquet
    TIMESTAMP(NANOS) (which Spark rejects outright, PARQUET_TYPE_ILLEGAL
    — read as raw nanos via the legacy flag and truncate to micros) and
    plain ``timestamp[us]`` with no timezone (which Spark reads as
    TIMESTAMP_NTZ, breaking ``unix_micros`` and streaming watermarks).
    Normalize both to a microsecond TimestampType column; the session
    timezone is pinned UTC (session.py), so the NTZ->TZ cast is lossless
    and DuckDB oracles agree."""
    path = posixpath.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return _normalize_ts(df)
    return spark.read.parquet(path)


def _normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce a drifting event-time column to microsecond TIMESTAMP."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":  # legacy nanosAsLong read of TIMESTAMP(NANOS)
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":  # parquet timestamp[us] without tz
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def stream_table(
    spark: SparkSession,
    src_dir: str,
    like_sf_dir: str,
    name: str = "events",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming file-source read of a staged table directory with the
    same type normalization as :func:`load_table` (events nanos ->
    microsecond TimestampType). ``src_dir`` is a DIRECTORY of parquet
    files (file stream sources watch directories); ``like_sf_dir``
    supplies the schema from the batch table of the same name."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(
        posixpath.join(like_sf_dir, f"{name}.parquet")
    ).schema
    df = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )
    if name == "events":
        df = _normalize_ts(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    out = {}
    for name in names or TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def kv_documents(df: DataFrame, key_col: str) -> DataFrame:
    """Recast a table as a documents change-feed: ``doc_key`` +
    payload columns (reference input shape, index.js:176-180)."""
    return df.withColumn("doc_key", F.col(key_col).cast("string"))
