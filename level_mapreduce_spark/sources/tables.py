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

    ``events.ts`` is written as Parquet TIMESTAMP(NANOS), which Spark
    rejects outright (PARQUET_TYPE_ILLEGAL) — read it as raw nanos via
    the legacy flag and truncate to a microsecond TimestampType column
    (exactly DuckDB's nanos->micros conversion, so oracles agree)."""
    path = posixpath.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


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
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
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
