"""Bulk-export KV ingestion bridge.

The reference consumes an object-mode stream of
``{key, value[, deleted]}`` records straight out of a LevelDB-style
store (index.js:173-180; its ``couchup`` dependency marks the
CouchDB-changes-feed intent, package.json:11). The batch/cluster
equivalent is a *bulk export*: JSONL where each line is

    {"key": "<doc key>", "value": {...}|null,
     "deleted": false, "seq": 42}

This module turns such a dump into the change-feed DataFrame shape
that :meth:`MapIndex.build` / :meth:`MapIndex.update` consume (payload
columns + key + ``deleted`` + ``seq``), and writes one back out for
round-trips.

100 TB notes: pass ``value_schema`` explicitly — schema inference is
an extra full pass over the dump. JSON parsing is JVM-side
(``from_json``), distributed, and the reader is a plain file scan, so
ingestion parallelism is the file split count; ``seq`` last-wins
semantics are applied by ``_normalize_changes`` (one window per
doc_key) only when the batch may contain multiple versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: top-level record envelope of one export line
_ENVELOPE = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("deleted", T.BooleanType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def read_kv_export(
    spark: SparkSession,
    path: str,
    value_schema: T.StructType | None = None,
    key_col: str = "doc_key",
) -> DataFrame:
    """Read a JSONL KV export into a change-feed DataFrame.

    Output columns: the parsed value payload columns (flattened),
    plus ``key_col`` (string), ``deleted`` (bool, null -> false) and
    ``seq`` (long). A deleted record carries a null payload.

    ``value_schema`` types the ``value`` document. Omitting it infers
    the schema from the live (non-deleted) values — convenient locally,
    but an extra scan; always pass it at scale.
    """
    # value is read as a raw JSON string first: an export mixes live
    # records with deleted ones (value null), and string-first lets
    # the envelope parse stay schema-stable either way
    raw = spark.read.schema(_ENVELOPE).json(path)
    if value_schema is None:
        sample = raw.where(F.col("value").isNotNull()).select("value")
        value_schema = spark.read.json(
            sample.rdd.map(lambda r: r[0])
        ).schema
    parsed = raw.select(
        F.from_json("value", value_schema).alias("_doc"),
        F.col("key").cast("string").alias(key_col),
        F.coalesce(F.col("deleted"), F.lit(False)).alias("deleted"),
        F.col("seq").cast("long").alias("seq"),
    )
    payload = [
        F.col(f"_doc.{f.name}").alias(f.name)
        for f in value_schema.fields
        if f.name not in (key_col, "deleted", "seq")
    ]
    return parsed.select(*payload, key_col, "deleted", "seq")


def write_kv_export(
    df: DataFrame,
    path: str,
    key_col: str,
    seq_col: str | None = None,
    deleted_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a table as a JSONL KV export (the round-trip twin of
    :func:`read_kv_export`). Payload = every column except the
    envelope columns; a deleted record is exported with value null."""
    env = {key_col, seq_col, deleted_col} - {None}
    payload = [c for c in df.columns if c not in env]
    deleted = (
        F.coalesce(F.col(deleted_col).cast("boolean"), F.lit(False))
        if deleted_col
        else F.lit(False)
    )
    seq = F.col(seq_col).cast("long") if seq_col else F.lit(0).cast("long")
    # value nests as a JSON OBJECT (the canonical dump shape); the
    # reader's string-typed envelope field receives it as raw JSON text
    line = F.to_json(
        F.struct(
            F.col(key_col).cast("string").alias("key"),
            F.when(~deleted, F.struct(*payload)).alias("value"),
            deleted.alias("deleted"),
            seq.alias("seq"),
        )
    )
    df.select(line.alias("value")).write.mode(mode).text(path)
