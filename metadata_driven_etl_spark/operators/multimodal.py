"""Multimodal column plumbing (extended surface — north star).

Treats image/audio/video payloads as opaque ``binary`` columns with a typed
metadata struct, processed through Arrow-batched ``mapInPandas`` pipelines.
The Spark-side plumbing (schemas, batch iteration, partition sizing, UDF
signatures) is real and tested; the actual codec work is STUBBED — this
container has no image/audio libraries — behind ``decoder=`` injection
points with a deterministic fake, and raises ``NotImplementedError`` when a
real decode is requested without a decoder.

Scale notes: binary payloads make rows wide — ``maxPartitionBytes`` keeps
task inputs bounded; mapInPandas streams Arrow batches so a partition never
fully materializes; metadata-only transforms (filtering by width/duration)
must project away the payload column FIRST so the scan prunes it.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, media_type string, n_bytes long, content_hash string, "
    "feature array<float>"
)

FRAME_SCHEMA = "media_id string, frame_index int, frame_payload binary"


def _make_fake_feature_decoder(dim: int = 8) -> Callable[[bytes], list[float]]:
    """Deterministic fake 'embedding' factory: bytes of md5(payload) scaled
    to [-1, 1]. Stands in for a real image/audio feature extractor.

    Returned as a nested closure (not a module-level function) so cloudpickle
    ships it BY VALUE into executor tasks — a module-level reference would
    require this package on every worker's PYTHONPATH, which the driver's
    vanilla session doesn't guarantee.
    """

    def decode(payload: bytes) -> list[float]:
        import hashlib

        digest = hashlib.md5(payload or b"").digest()
        return [b / 127.5 - 1.0 for b in digest[:dim]]

    return decode


def fake_feature_decoder(payload: bytes, dim: int = 8) -> list[float]:
    """Module-level convenience wrapper for tests/docs (do NOT close over
    this in task lambdas — use _make_fake_feature_decoder)."""
    return _make_fake_feature_decoder(dim)(payload)


# --- real decoders (pure Python, no native codecs required) ------------------
#
# The seam exists because this container has no image/audio libraries; these
# two decoders prove the seam with REAL formats that need none: binary PPM
# (P6) and PCM16 WAV both parse with the stdlib alone. They are written as
# closure factories for the same cloudpickle-by-value reason as the fake.


def make_ppm_feature_decoder() -> Callable[[bytes], list[float]]:
    """Decode a binary PPM (P6) image payload → 8-dim feature:
    [width, height, maxval, mean_R, mean_G, mean_B, luma, rgb_stddev],
    means scaled to [0, 1]. Raises ValueError on a malformed payload."""

    def decode(payload: bytes) -> list[float]:
        if not payload or not payload.startswith(b"P6"):
            raise ValueError("not a binary PPM (P6) payload")
        # header = magic, width, height, maxval as whitespace-separated
        # ASCII tokens ('#' comment lines allowed), then a single
        # whitespace byte, then width*height*3 raw bytes.
        tokens: list[int] = []
        pos = 2
        while len(tokens) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        width, height, maxval = tokens
        n = width * height
        raster = payload[pos : pos + n * 3]
        if len(raster) != n * 3 or maxval <= 0 or maxval > 255:
            raise ValueError("truncated or non-8-bit PPM raster")
        sums = [0, 0, 0]
        sq = 0
        for i, b in enumerate(raster):
            sums[i % 3] += b
            sq += b * b
        means = [s / n / maxval for s in sums]
        mean_all = sum(sums) / (3 * n)
        var = sq / (3 * n) - mean_all * mean_all
        luma = 0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
        return [
            float(width), float(height), float(maxval),
            means[0], means[1], means[2], luma,
            (var ** 0.5) / maxval,
        ]

    return decode


def make_wav_feature_decoder() -> Callable[[bytes], list[float]]:
    """Decode a PCM16 WAV payload → 8-dim feature:
    [channels, sample_rate, n_samples, duration_s, rms, peak, mean, zero-
    crossing rate], amplitudes normalized to [-1, 1]. Stdlib-only (RIFF
    chunk walk + struct). Raises ValueError on a malformed payload."""

    def decode(payload: bytes) -> list[float]:
        import struct

        if (
            not payload
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"
        ):
            raise ValueError("not a RIFF/WAVE payload")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid, size = payload[pos : pos + 4], struct.unpack(
                "<I", payload[pos + 4 : pos + 8]
            )[0]
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_fmt, channels, rate, _, _, bits = fmt
        if audio_fmt != 1 or bits != 16:
            raise ValueError(f"only PCM16 supported, got fmt={audio_fmt} bits={bits}")
        n = len(data) // 2
        samples = struct.unpack(f"<{n}h", data[: n * 2])
        if not n:
            return [float(channels), float(rate), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        scale = 32768.0
        sq = sum(s * s for s in samples)
        zc = sum(
            1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
        )
        return [
            float(channels), float(rate), float(n),
            n / (rate * channels),
            (sq / n) ** 0.5 / scale,
            max(abs(s) for s in samples) / scale,
            sum(samples) / n / scale,
            zc / max(n - 1, 1),
        ]

    return decode


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """payload → (n_bytes, content_hash, feature vector) via mapInPandas.

    ``decoder`` maps raw bytes to a feature vector; None → deterministic
    fake (real decoders need codec libs absent from this container).
    """
    import hashlib

    import pandas as pd

    decode = decoder or _make_fake_feature_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: decode(b or b"")),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    frame_extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video → sampled frame rows (one output row per kept frame).

    Real frame extraction needs a video codec — absent here, so calling
    without ``frame_extractor`` raises NotImplementedError INSIDE the task
    only for video rows; tests inject a fake extractor. The plumbing
    (row-expanding mapInPandas, frame indexing) is real.
    """
    import pandas as pd

    def extract(payload: bytes, every: int) -> list[bytes]:
        if frame_extractor is not None:
            return frame_extractor(payload, every)
        raise NotImplementedError(
            "video decode requires a codec library not present in this "
            "environment; inject frame_extractor="
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list[Any]] = {
                "media_id": [],
                "frame_index": [],
                "frame_payload": [],
            }
            # zip over raw column arrays — iterrows() builds a Series per
            # row and is ~10× slower per Arrow batch.
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = extract(payload, every_n)
                out["media_id"].extend([media_id] * len(frames))
                out["frame_index"].extend(
                    i * every_n for i in range(len(frames))
                )
                out["frame_payload"].extend(frames)
            yield pd.DataFrame(out)

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — projects the payload away first so the
    parquet scan never reads the heavy binary column."""
    slim = media.select("media_type", "width", "height", "duration_ms")
    return slim.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
