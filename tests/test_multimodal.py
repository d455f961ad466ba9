"""Multimodal plumbing: binary columns through mapInPandas pipelines."""

from __future__ import annotations

import pytest

from metadata_driven_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_feature_decoder,
    media_metadata_stats,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    rows = [
        ("m1", "image", "image/png", b"\x89PNG fake bytes 1", 640, 480, None),
        ("m2", "image", "image/png", b"\x89PNG fake bytes 2", 1280, 720, None),
        ("m3", "audio", "audio/wav", b"RIFF fake wav", None, None, 120_000),
        ("m4", "video", "video/mp4", b"\x00\x00ftyp fake mp4", 1920, 1080, 60_000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_deterministic(media):
    out = {r.media_id: r for r in extract_features(media).collect()}
    assert len(out) == 4
    m1 = out["m1"]
    assert m1.n_bytes == len(b"\x89PNG fake bytes 1")
    assert m1.feature == [pytest.approx(x) for x in
                          fake_feature_decoder(b"\x89PNG fake bytes 1")]
    # content-addressable: same payload → same hash; different → different
    assert out["m1"].content_hash != out["m2"].content_hash


def test_sample_frames_with_injected_extractor(media):
    def fake_frames(payload: bytes, every: int) -> list[bytes]:
        return [payload[:4], payload[4:8]]

    frames = sample_frames(media, every_n=5, frame_extractor=fake_frames).collect()
    assert [(f.media_id, f.frame_index) for f in frames] == [("m4", 0), ("m4", 5)]


def test_sample_frames_without_codec_raises(media):
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)):
        sample_frames(media, every_n=5).collect()


def test_metadata_stats_prunes_payload(media):
    stats = media_metadata_stats(media)
    rows = {r.media_type: r for r in stats.collect()}
    assert rows["image"].n_items == 2
    assert rows["image"].avg_width == pytest.approx((640 + 1280) / 2)


# --- real decoders (pure-Python PPM/WAV — no native codecs) ------------------


def _ppm_payload(width=4, height=2, rgb=(10, 20, 30)) -> bytes:
    header = f"P6\n# synthetic\n{width} {height}\n255\n".encode()
    return header + bytes(rgb) * (width * height)


def _wav_payload(rate=8000, samples=(0, 1000, -1000, 2000)) -> bytes:
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_ppm_decoder_end_to_end(spark):
    """The decoder seam with a REAL format: a valid binary PPM image flows
    through the same extract_features mapInPandas plumbing as production,
    with a genuine (stdlib-only) decode — not the deterministic fake."""
    from metadata_driven_etl_spark.operators.multimodal import (
        make_ppm_feature_decoder,
    )

    payload = _ppm_payload(width=4, height=2, rgb=(10, 20, 30))
    media = spark.createDataFrame(
        [("img1", "image", "image/x-portable-pixmap", payload, 4, 2, None)],
        MEDIA_SCHEMA,
    )
    row = extract_features(media, decoder=make_ppm_feature_decoder()).first()
    w, h, maxval, r, g, b, luma, sd = row.feature
    assert (w, h, maxval) == (4.0, 2.0, 255.0)
    assert r == pytest.approx(10 / 255)
    assert g == pytest.approx(20 / 255)
    assert b == pytest.approx(30 / 255)
    assert luma == pytest.approx(
        (0.299 * 10 + 0.587 * 20 + 0.114 * 30) / 255
    )
    assert row.n_bytes == len(payload)


def test_real_wav_decoder_end_to_end(spark):
    from metadata_driven_etl_spark.operators.multimodal import (
        make_wav_feature_decoder,
    )

    payload = _wav_payload(rate=8000, samples=(0, 16384, -16384, 0))
    media = spark.createDataFrame(
        [("aud1", "audio", "audio/wav", payload, None, None, None)],
        MEDIA_SCHEMA,
    )
    row = extract_features(media, decoder=make_wav_feature_decoder()).first()
    channels, rate, n, dur, rms, peak, mean, zcr = row.feature
    assert (channels, rate, n) == (1.0, 8000.0, 4.0)
    assert dur == pytest.approx(4 / 8000)
    assert peak == pytest.approx(0.5)
    assert rms == pytest.approx(((2 * 16384**2) / 4) ** 0.5 / 32768)


def test_real_decoders_reject_malformed(spark):
    from metadata_driven_etl_spark.operators.multimodal import (
        make_ppm_feature_decoder,
        make_wav_feature_decoder,
    )

    with pytest.raises(ValueError):
        make_ppm_feature_decoder()(b"\x89PNG not a ppm")
    with pytest.raises(ValueError):
        make_wav_feature_decoder()(b"RIFF1234NOPE")
    # truncated raster
    with pytest.raises(ValueError):
        make_ppm_feature_decoder()(_ppm_payload()[:-3])


def test_binary_file_ingest_to_features(spark, tmp_path):
    """Raw file corpus → binaryFile source → real PPM decode, end to end:
    the 100 TB ingest path (distributed listing, glob pruning, one row per
    file) feeding the multimodal feature extractor."""
    from metadata_driven_etl_spark.operators.multimodal import (
        extract_features,
        make_ppm_feature_decoder,
    )
    from metadata_driven_etl_spark.sources.readers import read_binary_media

    colors = {"a": (10, 20, 30), "b": (200, 100, 0), "c": (1, 2, 3)}
    sub = tmp_path / "nested"
    sub.mkdir()
    for name, rgb in colors.items():
        target = (tmp_path if name != "c" else sub) / f"{name}.ppm"
        target.write_bytes(_ppm_payload(width=4, height=2, rgb=rgb))
    (tmp_path / "ignore.txt").write_text("not media")

    media = read_binary_media(spark, str(tmp_path), glob="*.ppm")
    rows = {r.media_id.rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.ppm", "b.ppm", "c.ppm"}  # glob pruned, recursed
    assert all(r.media_type == "ppm" for r in rows.values())

    feats = extract_features(
        media, decoder=make_ppm_feature_decoder()
    ).collect()
    by_name = {r.media_id.rsplit("/", 1)[-1]: r.feature for r in feats}
    direct = make_ppm_feature_decoder()(_ppm_payload(width=4, height=2, rgb=(10, 20, 30)))
    # feature column is array<float> — compare at float32 precision
    assert by_name["a.ppm"] == pytest.approx(direct, rel=1e-6)


def _gradient_ppm(width=32, height=32, direction=1, noise=0) -> bytes:
    """Horizontal gradient PPM; direction=-1 reverses it; ``noise`` adds a
    deterministic per-pixel perturbation (still a 'same image' visually)."""
    header = f"P6\n{width} {height}\n255\n".encode()
    px = bytearray()
    for y in range(height):
        for x in range(width):
            v = int(255 * (x if direction > 0 else width - 1 - x) / (width - 1))
            v = max(0, min(255, v + ((x * 7 + y * 3) % (noise + 1) if noise else 0)))
            px += bytes((v, v, v))
    return bytes(header) + bytes(px)


def test_ppm_dhash_robust_to_noise_and_distinct_across_images(spark):
    from metadata_driven_etl_spark.operators.multimodal import (
        make_ppm_dhash_hasher,
        perceptual_hash,
    )

    h = make_ppm_dhash_hasher()
    clean = h(_gradient_ppm())
    noisy = h(_gradient_ppm(noise=3))
    reversed_ = h(_gradient_ppm(direction=-1))
    mask = (1 << 64) - 1
    assert clean == noisy  # perceptually identical → identical hash
    # different image → far (popcount over the unsigned bit pattern)
    assert bin((clean ^ reversed_) & mask).count("1") > 16

    media = spark.createDataFrame(
        [
            ("a", "image", "image/x-ppm", _gradient_ppm(), 32, 32, None),
            ("b", "image", "image/x-ppm", _gradient_ppm(noise=3), 32, 32, None),
            ("c", "image", "image/x-ppm", _gradient_ppm(direction=-1), 32, 32, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r.phash for r in perceptual_hash(media, h).collect()}
    assert rows["a"] == rows["b"] != rows["c"]


def test_phash_near_dup_pairs_banding(spark):
    from metadata_driven_etl_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    def _i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    base = 0x0123456789ABCDEF
    hashed = spark.createDataFrame(
        [
            ("a", "image", base),
            ("b", "image", base ^ 0b11),  # hamming 2 from a
            ("c", "image", _i64(base ^ ((1 << 63) | (1 << 40)))),  # hamming 2
            ("d", "image", ~base & 0x7FFFFFFFFFFFFFFF),  # far from all
        ],
        "media_id string, media_type string, phash long",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in phash_near_dup_pairs(hashed, max_hamming=2).collect()
    }
    assert pairs[("a", "b")] == 2
    assert pairs[("a", "c")] == 2
    assert ("a", "d") not in pairs and ("b", "d") not in pairs
    # b vs c differ in 4 bits (0,1,40,63) -> excluded at radius 2
    assert ("b", "c") not in pairs

    plan = (
        phash_near_dup_pairs(hashed, max_hamming=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_perceptual_hash_requires_hasher(media):
    import pytest as _pytest

    from metadata_driven_etl_spark.operators.multimodal import perceptual_hash

    with _pytest.raises(NotImplementedError):
        perceptual_hash(media)


def test_phash_banding_is_complete_vs_brute_force(spark):
    """Pigeonhole completeness: EVERY pair within the Hamming radius must
    be found by band blocking (the bands only prune, never lose). Checked
    against a brute-force popcount over seeded pseudo-random hashes."""
    import hashlib
    from itertools import combinations

    from metadata_driven_etl_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    def h64(i: int) -> int:
        v = int.from_bytes(hashlib.md5(f"ph|{i}".encode()).digest()[:8], "big")
        # cluster the space: zero the low 48 bits for even i so several
        # hashes land within small Hamming distances of each other
        if i % 2 == 0:
            v &= (1 << 63) | 0xF
        return v - (1 << 64) if v >= (1 << 63) else v

    ids = [f"m{i:02d}" for i in range(40)]
    hashes = {mid: h64(i) for i, mid in enumerate(ids)}
    mask = (1 << 64) - 1
    for radius in (1, 2, 3):
        want = {
            (a, b): bin((hashes[a] ^ hashes[b]) & mask).count("1")
            for a, b in combinations(ids, 2)
            if bin((hashes[a] ^ hashes[b]) & mask).count("1") <= radius
        }
        hashed = spark.createDataFrame(
            [(m, "image", hashes[m]) for m in ids],
            "media_id string, media_type string, phash long",
        )
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in phash_near_dup_pairs(hashed, max_hamming=radius).collect()
        }
        assert got == want, f"radius {radius}"
        assert want, f"degenerate fixture at radius {radius}"
