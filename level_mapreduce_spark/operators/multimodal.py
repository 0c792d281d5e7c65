"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The Spark-side contract is real and tested — schema, partitioning,
UDF signature, batch shape. Codec status by ``decode_fn``:

- ``'ppm'`` — a REAL image codec with no external dependency: binary
  PNM (PPM ``P6`` rgb / PGM ``P5`` gray) parsed and re-encoded with
  numpy. Real pixel semantics: features are per-channel statistics of
  the decoded raster, resize is true nearest-neighbor resampling
  (pixel-verified in tests). Malformed payloads yield null features /
  null payload instead of killing the batch (quarantine convention,
  like sources/jsonl.py).
- ``'wav'`` — a REAL audio codec, stdlib ``wave`` + numpy: RIFF/WAVE
  PCM16 decoded to samples; features are duration, rate, channels,
  RMS level, zero-crossing rate, and peak (signal-verified against a
  synthesized sine in tests). Same null-quarantine convention.
- ``'fake'`` (default) — deterministic byte-moment pseudo-features
  for arbitrary payloads; exercises identical plumbing.
- ``'real'`` — the PIL/ffmpeg/librosa plug-point for compressed
  formats (jpeg/mp3/mp4); those libs are absent in this container, so
  it raises ``NotImplementedError`` by design.

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


def _parse_pnm(b: bytes):
    """Decode binary PNM (``P6`` rgb / ``P5`` gray) to a numpy array
    of shape (h, w, channels), dtype uint8. Pure numpy — no imaging
    library. Returns ``None`` for anything malformed (bad magic,
    truncated raster, maxval > 255) rather than raising: one corrupt
    blob must not kill an Arrow batch."""
    import numpy as np

    try:
        if not b or b[:2] not in (b"P6", b"P5"):
            return None
        channels = 3 if b[:2] == b"P6" else 1
        # header tokens: magic, width, height, maxval; '#' comments to
        # end-of-line are legal anywhere in the header
        pos, tokens = 2, []
        while len(tokens) < 3 and pos < len(b):
            c = b[pos : pos + 1]
            if c == b"#":
                pos = b.index(b"\n", pos) + 1
            elif c.isspace():
                pos += 1
            else:
                end = pos
                while end < len(b) and not b[end : end + 1].isspace():
                    end += 1
                tokens.append(int(b[pos:end]))
                pos = end
        if len(tokens) < 3:
            return None
        w, h, maxval = tokens
        if maxval > 255 or w <= 0 or h <= 0:
            return None
        pos += 1  # single whitespace byte after maxval
        raster = np.frombuffer(b, dtype=np.uint8, offset=pos)
        need = h * w * channels
        if len(raster) < need:
            return None
        return raster[:need].reshape(h, w, channels)
    except (ValueError, IndexError):
        return None


def _encode_ppm(arr) -> bytes:
    """(h, w, channels) uint8 -> binary PNM bytes (P6 for 3-channel,
    P5 for 1-channel)."""
    h, w, c = arr.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def _ppm_features(b: bytes, n_features: int):
    """Real image features from a decoded PNM raster: per-channel
    mean and std (in pixel-value units), then height/width — padded
    with zeros / truncated to exactly ``n_features``. None (not
    zeros) when the payload doesn't decode."""
    img = _parse_pnm(b)
    if img is None:
        return None
    stats: list[float] = []
    for ch in range(img.shape[2]):
        stats.append(float(img[:, :, ch].mean()))
    for ch in range(img.shape[2]):
        stats.append(float(img[:, :, ch].std()))
    stats += [float(img.shape[0]), float(img.shape[1])]
    return (stats + [0.0] * n_features)[:n_features]


def _parse_wav(b: bytes):
    """Decode a RIFF/WAVE PCM16 payload to (sample_rate, samples) with
    ``samples`` a numpy (n_frames, n_channels) int16 array. Pure
    stdlib+numpy (the stdlib ``wave`` module handles chunk walking).
    Returns ``None`` for malformed/compressed payloads — quarantine,
    don't crash the batch."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(b), "rb") as w:
            if w.getsampwidth() != 2:  # PCM16 only
                return None
            rate = w.getframerate()
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
        samples = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
        return rate, samples
    except (wave.Error, EOFError, ValueError):
        return None


def _encode_wav(samples, rate: int) -> bytes:
    """(n_frames, n_channels) int16 + rate -> RIFF/WAVE PCM16 bytes."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def _wav_features(b: bytes, n_features: int):
    """Real audio features from decoded PCM: duration (s), sample
    rate, channels, RMS level, zero-crossing rate, and peak amplitude
    (all on the first channel, amplitudes normalized to [0,1]) —
    padded/truncated to ``n_features``. None when the payload doesn't
    decode."""
    import numpy as np

    decoded = _parse_wav(b)
    if decoded is None:
        return None
    rate, samples = decoded
    x = samples[:, 0].astype(np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return ([0.0, float(rate), float(samples.shape[1])] + [0.0] * n_features)[
            :n_features
        ]
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n
    stats = [
        n / float(rate),
        float(rate),
        float(samples.shape[1]),
        float(np.sqrt((x * x).mean())),
        zc,
        float(np.abs(x).max()),
    ]
    return (stats + [0.0] * n_features)[:n_features]


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

    ``decode_fn='ppm'`` is the REAL pure-numpy PNM image codec
    (per-channel mean/std + dimensions), ``'wav'`` the REAL PCM16
    audio codec (duration/rate/channels/RMS/zero-crossings/peak);
    both return null features for payloads that don't decode.
    ``'fake'`` derives deterministic byte moments from any payload.
    ``'real'`` is the PIL/ffmpeg plug-point for compressed formats;
    it raises ``NotImplementedError`` here (libs absent by design).
    """
    if decode_fn == "real":
        raise NotImplementedError(
            "decoding compressed formats (jpeg/mp3/mp4) requires "
            "PIL/ffmpeg, absent in this container; use "
            "decode_fn='ppm' (real PNM codec) or 'fake' (byte "
            "moments) — the Spark plumbing is identical"
        )
    if decode_fn not in ("fake", "ppm", "wav"):
        raise ValueError(f"unknown decode_fn {decode_fn!r}")
    decode = {
        "ppm": _ppm_features,
        "wav": _wav_features,
        "fake": lambda b, n: _fake_decode(b or b"", n),
    }[decode_fn]

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
                        lambda b: decode(b or b"", n_features)
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

    ``decode_fn='ppm'`` REALLY resizes: decode the PNM raster,
    nearest-neighbor resample to (height, width) with numpy index
    arithmetic, re-encode PNM — pixel-verified in tests; payloads
    that don't decode come back null. ``'fake'`` byte-samples the
    payload down to exactly ``width*height`` bytes (deterministic,
    size-correct batch shape for arbitrary blobs). ``'real'`` is the
    PIL plug-point for compressed formats (absent ->
    NotImplementedError).
    """
    if decode_fn == "real":
        raise NotImplementedError(
            "resizing compressed formats requires PIL, absent in this "
            "container; use decode_fn='ppm' (real PNM resample) or "
            "'fake' (stride byte-sampling) — the Spark plumbing is "
            "identical"
        )
    if decode_fn not in ("fake", "ppm"):
        raise ValueError(f"unknown decode_fn {decode_fn!r}")
    n_out = width * height

    def _resize_fake(b: bytes | None) -> bytes:
        b = b or b"\x00"
        step = max(len(b) // n_out, 1)
        return (b[::step] + b"\x00" * n_out)[:n_out]

    def _resize_ppm(b: bytes | None):
        import numpy as np

        img = _parse_pnm(b or b"")
        if img is None:
            return None
        h, w, _ = img.shape
        rows = (np.arange(height) * h // height).astype(np.int64)
        cols = (np.arange(width) * w // width).astype(np.int64)
        return _encode_ppm(img[rows][:, cols])

    _resize = _resize_ppm if decode_fn == "ppm" else _resize_fake

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
