"""Multimodal-column plumbing tests: binary columns + typed metadata through
Arrow-batched mapInPandas stages (decode is a deterministic stub; schema,
batching, partitioning, and composition are the product under test)."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from phoebe_spark.operators.multimodal import (
    attach_media_metadata,
    audio_features,
    frame_sample,
    image_features,
    image_resize,
    partition_by_size,
)

JPEG_MAGIC = bytes([0xFF, 0xD8, 0xFF]) + b"fakejpegbytes"
PNG_MAGIC = b"\x89PNG\r\n" + b"fakepngbytes"
WAV_MAGIC = b"RIFF" + b"fakewavbytes"


@pytest.fixture(scope="module")
def images(spark):
    rng = np.random.default_rng(42)
    rows = [
        (i, "image/jpeg", 32 + int(rng.integers(0, 32)), 24 + int(rng.integers(0, 24)),
         0, JPEG_MAGIC + bytes(rng.integers(0, 256, 200).astype(np.uint8)))
        for i in range(20)
    ]
    return spark.createDataFrame(
        rows, "media_id LONG, mime STRING, width INT, height INT, n_bytes LONG, content BINARY"
    )


@pytest.fixture(scope="module")
def audio(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, "audio/wav", 16000, 16000 * 2, 0, WAV_MAGIC + bytes(rng.integers(0, 256, 100).astype(np.uint8)))
        for i in range(10)
    ]
    return spark.createDataFrame(
        rows, "media_id LONG, mime STRING, sample_rate INT, n_samples LONG, n_bytes LONG, content BINARY"
    )


def test_metadata_sniff(spark, images):
    out = attach_media_metadata(images).collect()
    assert all(r["sniffed_mime"] == "image/jpeg" for r in out)
    assert all(r["n_bytes"] == len(bytes(r["content"])) for r in out)
    mixed = spark.createDataFrame(
        [(1, PNG_MAGIC), (2, WAV_MAGIC), (3, b"garbage")], "media_id LONG, content BINARY"
    )
    sniffed = {r["media_id"]: r["sniffed_mime"] for r in attach_media_metadata(mixed).collect()}
    assert sniffed == {1: "image/png", 2: "audio/wav", 3: "application/octet-stream"}


def test_image_features_deterministic(images):
    a = {r["media_id"]: r["ahash"] for r in image_features(images).collect()}
    b = {r["media_id"]: r["ahash"] for r in image_features(images).collect()}
    assert a == b  # decode stub + features are deterministic
    rows = image_features(images).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r["mean_r"] <= 255 and 0 <= r["mean_b"] <= 255
        assert r["std_gray"] > 0


def test_image_resize_composes_with_features(images):
    resized = image_resize(images, target=(16, 16))
    rows = resized.collect()
    assert all(r["width"] == 16 and r["height"] == 16 for r in rows)
    assert all(len(zlib.decompress(bytes(r["content"]))) == 16 * 16 * 3 for r in rows)
    # composition: resized output feeds the feature stage unchanged
    feats = image_features(
        resized,
        decoder=lambda content, w, h: np.frombuffer(
            zlib.decompress(content), dtype=np.uint8
        ).reshape(h, w, 3),
    ).collect()
    assert len(feats) == 20


def test_audio_features(audio):
    rows = audio_features(audio).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["duration_s"] == pytest.approx(2.0)
        assert 0.9 < r["rms"] < 1.1  # standard-normal stub PCM
        assert 0 < r["zero_crossing_rate"] < 1


def test_frame_sample_plan(audio):
    out = frame_sample(audio.withColumnRenamed("n_samples", "n_samples"), every_n=8000, max_frames=3)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 8000, 16000] for v in per.values())


def test_partition_by_size_spreads(images):
    out = partition_by_size(images, num_buckets=8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 20


def test_wav_decode_real_riff_end_to_end(spark):
    """The stdlib-wave decoder is REAL: synthesize an actual RIFF/WAVE PCM
    byte string, run the full audio_features pipeline over it, and check
    the physics (a sine's RMS is amplitude/sqrt(2), zero crossings track
    frequency) — no stub anywhere in the path."""
    import io
    import wave

    from phoebe_spark.operators.multimodal import wav_decode

    sr, freq, amp, dur_s = 8000, 440.0, 0.5, 2.0
    t = np.arange(int(sr * dur_s)) / sr
    pcm = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    wav_bytes = buf.getvalue()
    assert wav_bytes[:4] == b"RIFF"  # genuine container magic

    # direct decode round-trip
    x = wav_decode(wav_bytes)
    assert x.dtype == np.float32 and len(x) == len(pcm)
    assert float(np.max(np.abs(x))) <= 1.0

    df = spark.createDataFrame(
        [(1, "audio/wav", sr, len(pcm), len(wav_bytes), bytearray(wav_bytes))],
        "media_id LONG, mime STRING, sample_rate INT, n_samples LONG, n_bytes LONG, content BINARY",
    )
    r = audio_features(df, decoder=wav_decode).collect()[0]
    assert r["duration_s"] == pytest.approx(dur_s)
    assert r["rms"] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    # a 440 Hz sine crosses zero 2*440 times/s -> rate ~= 2*freq/sr
    assert r["zero_crossing_rate"] == pytest.approx(2 * freq / sr, rel=0.05)


def test_wav_decode_stereo_and_8bit(spark):
    import io
    import wave

    from phoebe_spark.operators.multimodal import wav_decode

    # stereo 16-bit: L = sine, R = -sine -> mono mean ~ 0
    sr = 4000
    t = np.arange(sr) / sr
    s = (0.25 * np.sin(2 * np.pi * 100 * t) * 32767).astype("<i2")
    inter = np.empty(2 * len(s), dtype="<i2")
    inter[0::2], inter[1::2] = s, -s
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(inter.tobytes())
    x = wav_decode(buf.getvalue())
    assert len(x) == len(s)
    assert float(np.max(np.abs(x))) < 1e-4

    # 8-bit unsigned PCM silence decodes to ~0
    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(sr)
        w.writeframes(bytes([128] * sr))
    x8 = wav_decode(buf8.getvalue())
    assert float(np.max(np.abs(x8))) == 0.0


def _encode_png(img: np.ndarray, filters) -> bytes:
    """Minimal PNG writer for the decoder tests: 8-bit, non-interlaced,
    per-row filter choice (exercises all five RFC 2083 filters)."""
    import struct
    import zlib as _zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", _zlib.crc32(t + d))

    flat = img.reshape(h, w * c).astype(np.int32)
    bpp = c
    raw = b""
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        line = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - left
        elif f == 2:
            filt = line - prev
        elif f == 3:
            filt = line - (left + prev) // 2
        else:
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
            filt = line - pred
        raw += bytes([f]) + bytes((filt % 256).astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_roundtrip():
    """png_decode must invert every PNG scanline filter exactly: encode a
    known image cycling through None/Sub/Up/Average/Paeth rows, decode,
    compare pixel-for-pixel."""
    from phoebe_spark.operators.multimodal import png_decode

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(15, 9, 3), dtype=np.uint8)
    got = png_decode(_encode_png(img, filters=[0, 1, 2, 3, 4]))
    assert got.shape == img.shape
    assert np.array_equal(got, img)

    # greyscale replicates to 3 channels; RGBA drops alpha
    grey = rng.integers(0, 256, size=(7, 5), dtype=np.uint8)
    g3 = png_decode(_encode_png(grey, filters=[4, 3, 2, 1, 0]))
    assert np.array_equal(g3, np.repeat(grey[:, :, None], 3, axis=2))
    rgba = rng.integers(0, 256, size=(6, 4, 4), dtype=np.uint8)
    got_rgba = png_decode(_encode_png(rgba, filters=[2, 4]))
    assert np.array_equal(got_rgba, rgba[..., :3])


def test_png_decode_through_image_pipeline(spark):
    """End-to-end: REAL PNG bytes through image_features and image_resize —
    no stub anywhere in the path."""
    from phoebe_spark.operators.multimodal import image_features, image_resize, png_decode

    rng = np.random.default_rng(5)
    rows = []
    imgs = {}
    for i in range(6):
        img = rng.integers(0, 256, size=(16 + i, 12 + i, 3), dtype=np.uint8)
        imgs[i] = img
        png = _encode_png(img, filters=[0, 1, 2, 3, 4])
        rows.append((i, "image/png", img.shape[1], img.shape[0], len(png), bytearray(png)))
    df = spark.createDataFrame(
        rows, "media_id LONG, mime STRING, width INT, height INT, n_bytes LONG, content BINARY"
    )
    feats = {r["media_id"]: r for r in image_features(df, decoder=png_decode).collect()}
    for i, img in imgs.items():
        assert feats[i]["mean_r"] == pytest.approx(float(img[..., 0].mean()))
        assert feats[i]["mean_b"] == pytest.approx(float(img[..., 2].mean()))
    resized = image_resize(df, target=(8, 8), decoder=png_decode).collect()
    assert all(r["width"] == 8 and r["height"] == 8 for r in resized)


def test_image_neardup_via_ahash_hamming(spark):
    """Multimodal dedup composition on REAL bytes: PNG decode -> perceptual
    average-hash -> Hamming banding pairs. A slightly-noised copy of an
    image must pair with its original at low distance; unrelated images
    must not pair."""
    from phoebe_spark.operators.dedup import hamming_pairs
    from phoebe_spark.operators.multimodal import image_features, png_decode

    rng = np.random.default_rng(21)
    imgs = {i: rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8) for i in range(6)}
    # planted near-dup: image 6 = image 0 plus faint noise
    noisy = imgs[0].astype(np.int16) + rng.integers(-6, 7, size=imgs[0].shape)
    imgs[6] = np.clip(noisy, 0, 255).astype(np.uint8)
    rows = []
    for i, img in imgs.items():
        png = _encode_png(img, filters=[0, 1, 2, 3, 4])
        rows.append((i, "image/png", img.shape[1], img.shape[0], len(png), bytearray(png)))
    df = spark.createDataFrame(
        rows, "media_id LONG, mime STRING, width INT, height INT, n_bytes LONG, content BINARY"
    )
    hashes = image_features(df, decoder=png_decode).select(
        "media_id", F.col("ahash").alias("hash64")
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_pairs(hashes, id_col="media_id", max_hamming=8, bands=16).collect()
    }
    assert (0, 6) in pairs and pairs[(0, 6)] <= 8
    assert all(p == (0, 6) for p in pairs), f"false pairs: {pairs}"
