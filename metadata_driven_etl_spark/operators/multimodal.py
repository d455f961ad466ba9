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
            for _, row in pdf.iterrows():
                frames = extract(row["payload"], every_n)
                for i, fr in enumerate(frames):
                    out["media_id"].append(row["media_id"])
                    out["frame_index"].append(i * every_n)
                    out["frame_payload"].append(fr)
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
