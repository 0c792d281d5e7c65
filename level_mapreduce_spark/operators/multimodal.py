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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 16, height: int = 16,
    decode_fn: str = "fake",
) -> DataFrame:
    """Arrow-batched image resize: binary in -> binary out (payload
    replaced by the resized encoding), zero shuffles — the bulk
    re-encode step of an image-corpus pipeline.

    ``decode_fn='real'`` is the PIL plug-point (absent in this
    container -> NotImplementedError). The 'fake' codec byte-samples
    the payload down to exactly ``width*height`` bytes (stride
    sampling — deterministic, size-correct, so downstream batch-shape
    and memory behavior match a real resize).
    """
    if decode_fn == "real":
        raise NotImplementedError(
            "real image resize requires PIL, absent in this container; "
            "use decode_fn='fake' (stride byte-sampling) — the Spark "
            "plumbing is identical"
        )
    if decode_fn != "fake":
        raise ValueError(f"unknown decode_fn {decode_fn!r}")
    n_out = width * height

    def _resize(b: bytes | None) -> bytes:
        b = b or b"\x00"
        step = max(len(b) // n_out, 1)
        return (b[::step] + b"\x00" * n_out)[:n_out]

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(_resize),
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
    decode_fn: str = "fake",
) -> DataFrame:
    """Video frame sampling: ONE media row -> MANY frame rows (the
    one-to-many ``mapInPandas`` shape a video pipeline needs; output
    cardinality is data-dependent, capped by ``max_frames``).

    ``decode_fn='real'`` is the ffmpeg plug-point (absent ->
    NotImplementedError). The 'fake' codec treats every
    ``every_n_bytes`` slice of the payload as one "frame" — the
    expansion topology (row counts, ordering, memory per batch) is
    exactly what a keyframe sampler produces.
    """
    if decode_fn == "real":
        raise NotImplementedError(
            "real frame sampling requires ffmpeg, absent in this "
            "container; use decode_fn='fake' (byte-slice frames) — "
            "the Spark plumbing is identical"
        )
    if decode_fn != "fake":
        raise ValueError(f"unknown decode_fn {decode_fn!r}")

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = payload or b""
                n = min(max(len(b) // every_n_bytes, 1), max_frames)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.where(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )
