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
    LongType,
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


def python_stage_partitions(
    spark, n_rows: int, rows_per_task: int = 64
) -> int:
    """Partition count for a Python (mapInPandas) stage over a KNOWN row
    volume (guide §4.2/§2.2): every Python task pays a fixed worker
    round-trip (fork-or-reuse handshake + Arrow IPC stream setup), so a
    tiny input sliced to cluster parallelism pays ~cores × that overhead
    for microseconds of real work. Measured (r13, sf0.1): the 200-image
    phash stage at local[32] ran 32 Python tasks of ~6 rows each —
    1.85 s warm; at 3-4 tasks the same query runs 0.91 s (and local[32]
    stops ANTI-scaling vs local[8], the r12 VERDICT finding). The count
    is derived from DATA (``n_rows // rows_per_task``, floored at 1) and
    capped by cluster parallelism, so large inputs keep full fan-out —
    scale-adaptive, not tuned to any core count."""
    return max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            n_rows // rows_per_task,
        ),
    )


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


# --- perceptual-hash image dedup (dHash) ------------------------------------

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("phash", LongType(), True),
    ]
)


def make_ppm_dhash_hasher(hash_size: int = 8) -> Callable[[bytes], int]:
    """Binary PPM (P6) payload → 64-bit dHash (difference hash).

    The standard perceptual image fingerprint: grayscale, box-downsample
    to (hash_size+1)×hash_size, emit one bit per adjacent-pixel gradient
    sign. Robust to re-encoding, brightness shifts, and small noise —
    the image-side analogue of SimHash for near-dup detection. Pure
    stdlib (the PPM raster is already raw RGB); real JPEG/PNG inputs
    need a codec library absent from this container — inject a decoder
    that yields (width, height, gray_rows) to reuse the same hasher.
    """

    def hasher(payload: bytes) -> int:
        if not payload or not payload.startswith(b"P6"):
            raise ValueError("not a binary PPM (P6) payload")
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
        pos += 1
        width, height, maxval = tokens
        n = width * height
        raster = payload[pos : pos + n * 3]
        if len(raster) != n * 3 or maxval <= 0 or maxval > 255:
            raise ValueError("truncated or non-8-bit PPM raster")
        # grayscale box-downsample to (hash_size+1) x hash_size
        gw, gh = hash_size + 1, hash_size
        grid = [[0.0] * gw for _ in range(gh)]
        cnt = [[0] * gw for _ in range(gh)]
        for y in range(height):
            gy = min(y * gh // height, gh - 1)
            row = y * width
            for x in range(width):
                i = (row + x) * 3
                gray = (
                    0.299 * raster[i] + 0.587 * raster[i + 1] + 0.114 * raster[i + 2]
                )
                gx = min(x * gw // width, gw - 1)
                grid[gy][gx] += gray
                cnt[gy][gx] += 1
        bits = 0
        k = 0
        for gy in range(gh):
            for gx in range(gw - 1):
                a = grid[gy][gx] / max(cnt[gy][gx], 1)
                b = grid[gy][gx + 1] / max(cnt[gy][gx + 1], 1)
                if a > b:
                    bits |= 1 << k
                k += 1
        # two's-complement wrap: Spark LongType is signed int64 and bit 63
        # is a legal dHash bit
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    return hasher


def perceptual_hash(
    media: DataFrame, hasher: Callable[[bytes], int] | None = None
) -> DataFrame:
    """(media_id, media_type, phash) via mapInPandas (Arrow-batched)."""
    import pandas as pd

    if hasher is None:
        raise NotImplementedError(
            "no default perceptual hasher: real image decoding needs codec "
            "libraries absent from this container — pass "
            "make_ppm_dhash_hasher() for PPM payloads or inject your own"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "phash": pdf["payload"].map(hasher).astype("int64"),
                }
            )

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dup_pairs(
    hashed: DataFrame,
    max_hamming: int = 2,
    num_bits: int = 64,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-dup image pairs: Hamming(phash_a, phash_b) ≤ ``max_hamming``.

    Scale shape: pigeonhole band blocking (split the hash into
    ``max_hamming + 1`` bit-bands; any pair within the radius must agree
    exactly on ≥1 band) → the only pair generator is an equi-join on
    (band, band_bits); candidates verify with one ``bit_count(a XOR b)``.
    Never the O(n²) cross join — same construction as SimHash banding.
    """
    n_bands = max_hamming + 1
    width = num_bits // n_bands
    bands = hashed.select(
        F.col(id_col),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bbits"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "phash", "bb.band", "bb.bbits")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bbits") == F.col("b.bbits"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
