"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The Spark-side contract is real and tested — schema, partitioning,
UDF signature, batch shape. The actual codec step is STUBBED: the
decode libraries (PIL/ffmpeg/librosa) are not in this container, so
``decode_fn='real'`` raises ``NotImplementedError`` and the default
``'fake'`` decoder derives deterministic pseudo-features from the raw
bytes. Swapping in a real decoder is a one-function change; everything
around it (Arrow batching, schema, partition sizing) is production
shape.

100 TB notes: media blobs dominate row size, so the iterator yields
per-batch DataFrames (constant memory per task) and callers should
size ``spark.sql.files.maxPartitionBytes`` so one task's batch of
blobs fits executor memory; feature extraction is embarrassingly
parallel with zero shuffles.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a MEDIA_SCHEMA DataFrame from the documents table (the
    container has no real image fixtures): payload = utf8 bytes of the
    text, media_type round-robins image/audio/video."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a real codec: n_features moments of
    the byte distribution."""
    if not payload:
        return [0.0] * n_features
    out = []
    for i in range(n_features):
        # strided byte means — cheap, deterministic, batch-friendly
        stride = payload[i::n_features] or b"\x00"
        out.append(sum(stride) / len(stride))
    return out


def extract_features(
    media: DataFrame, n_features: int = 8, decode_fn: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``decode_fn='real'`` is where an image/audio decoder would plug in;
    it raises ``NotImplementedError`` here (libs absent by design).
    """
    if decode_fn == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, absent in this "
            "container; use decode_fn='fake' (deterministic byte "
            "moments) — the Spark plumbing is identical"
        )
    if decode_fn != "fake":
        raise ValueError(f"unknown decode_fn {decode_fn!r}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else 0
                    ).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: sum(b) % (1 << 31) if b is not None else 0
                    ).astype("int64"),
                    "features": payloads.map(
                        lambda b: _fake_decode(b or b"", n_features)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
