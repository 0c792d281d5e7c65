"""JSONL document ingestion — the wire format of training corpora.

The reference ingests documents from an object-mode JS stream and
simply crashes the pipeline on a malformed record (index.js:176-180
errors the callback). At 100 TB malformed lines are a statistical
certainty, and one poison line must not kill a 1000-executor job or
silently vanish: ingestion needs an explicit quarantine channel.

Spark-native: the JSON reader's PERMISSIVE mode parses what it can and
captures the raw text of unparseable lines in a corrupt-record column
— per-line handling, JVM-side, no Python in the path. The helpers
below split that into a clean typed DataFrame and a quarantine
DataFrame carrying the offending raw lines (route it to a side sink
for inspection/repair — the dead-letter-queue pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL into ``(good, quarantine)``: ``good`` has exactly
    ``schema``'s typed columns (fully parsed lines only), ``quarantine``
    one ``raw`` string column per malformed line.

    The parsed frame is cached before the corrupt-column split — Spark
    forbids filtering on the corrupt column of an uncached PERMISSIVE
    read (the raw text only exists during parsing). The cache holds one
    pass of the input; unpersist through ``good`` when done, or write
    both sides immediately (the normal pipeline shape).
    """
    read_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = (
        spark.read.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    good = parsed.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Write a DataFrame as JSONL (one JSON object per line —
    round-trips through :func:`read_jsonl` with the same schema).
    ``n_files`` caps output file count for hand-off to downstream
    tools; omit to keep the current partitioning."""
    out = df.coalesce(n_files) if n_files is not None else df
    out.write.mode("overwrite").json(path)
