"""Pure-stdlib PNG codec tests (sources/png.py) + multimodal wiring."""

from __future__ import annotations

import struct
import zlib

import pytest

from ytsaurus_spark.sources.png import PNG_MAGIC, _chunk, png_decode, png_encode


def _pixels(w, h):
    return bytes((x * 13 + y * 31 + c * 7) % 256 for y in range(h) for x in range(w) for c in range(3))


def test_round_trip():
    w, h = 7, 5
    px = _pixels(w, h)
    assert png_decode(png_encode(w, h, px)) == (w, h, px)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_decode_all_filters(ftype):
    # encode manually with each filter type and check reconstruction
    w, h = 4, 3
    px = _pixels(w, h)
    stride = w * 3
    rows = [bytearray(px[y * stride : (y + 1) * stride]) for y in range(h)]
    prev = bytearray(stride)
    filtered = []
    for row in rows:
        cur = bytearray(row)
        if ftype == 1:
            for i in range(stride - 1, 2, -1):
                cur[i] = (cur[i] - cur[i - 3]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                cur[i] = (cur[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride - 1, -1, -1):
                left = row[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            from ytsaurus_spark.sources.png import _paeth

            for i in range(stride - 1, -1, -1):
                left = row[i - 3] if i >= 3 else 0
                ul = prev[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] - _paeth(left, prev[i], ul)) & 0xFF
        filtered.append(bytes([ftype]) + bytes(cur))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(filtered)))
        + _chunk(b"IEND", b"")
    )
    assert png_decode(data) == (w, h, px)


def test_rejects_bad_magic_and_wrong_sizes():
    with pytest.raises(ValueError, match="magic"):
        png_decode(b"JFIF" + b"\x00" * 32)
    with pytest.raises(ValueError, match="pixel buffer"):
        png_encode(2, 2, b"\x00" * 5)


def test_decode_image_routes_png():
    from ytsaurus_spark.operators.multimodal import decode_image

    w, h, mode = decode_image(png_encode(3, 2, _pixels(3, 2)), "image/png")
    assert (w, h, mode) == (3, 2, "RGB")


def test_synthesize_and_extract_spark(spark):
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.multimodal import (
        extract_image_features,
        synthesize_png,
    )

    docs = spark.range(0, 6).select(F.col("id").alias("doc_id"))
    feats = extract_image_features(synthesize_png(docs)).collect()
    assert len(feats) == 6
    for r in feats:
        assert r.width == 4 + r.id % 3 and r.height == 4 + r.id % 2
        assert 0.0 <= r.mean_r <= 255.0


def test_wav_round_trip_spark(spark):
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.multimodal import (
        extract_audio_features,
        synthesize_wav,
    )

    docs = spark.range(0, 4).select(F.col("id").alias("doc_id"))
    rows = {r.id: r for r in extract_audio_features(synthesize_wav(docs)).collect()}
    assert rows[0].n_samples == 256 and rows[0].sample_rate == 8000
    assert rows[1].n_samples == 257 and rows[1].sample_rate == 16000
    assert rows[0].duration_ms == 32.0  # 256 frames @ 8 kHz
    assert all(r.rms > 0 for r in rows.values())


def test_video_frames_round_trip(spark):
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.multimodal import (
        extract_video_frames,
        synthesize_video,
    )

    docs = spark.range(0, 5).select(F.col("id").alias("doc_id"))
    all_frames = extract_video_frames(synthesize_video(docs), every_n=1).collect()
    per_doc = {}
    for r in all_frames:
        per_doc.setdefault(r.id, []).append(r.frame_idx)
    for i, idxs in per_doc.items():
        assert sorted(idxs) == list(range(2 + i % 3))
    sampled = extract_video_frames(synthesize_video(docs), every_n=2).collect()
    assert all(r.frame_idx % 2 == 0 for r in sampled)


def test_resize_images_round_trip(spark):
    from pyspark.sql import functions as F

    from ytsaurus_spark.operators.multimodal import resize_images, synthesize_png

    docs = spark.range(0, 4).select(F.col("id").alias("doc_id"))
    out = {r.id: r for r in resize_images(synthesize_png(docs), factor=2).collect()}
    for i, r in out.items():
        assert r.width == (4 + i % 3 + 1) // 2
        assert r.height == (4 + i % 2 + 1) // 2


def test_image_phash_identical_and_bitlen(spark):
    from ytsaurus_spark.operators.multimodal import image_phash, synthesize_png

    ids = spark.createDataFrame([(1,), (2,), (257,)], "doc_id bigint")
    ph = {
        r.id: r.phash
        for r in image_phash(synthesize_png(ids)).collect()
    }
    # bit length = w*h of each synthesized image
    assert len(ph[1]) == (4 + 1 % 3) * (4 + 1 % 2)
    assert len(ph[2]) == (4 + 2 % 3) * (4 + 2 % 2)
    # same generator content -> same hash; different ids -> (here) different
    ph2 = {
        r.id: r.phash
        for r in image_phash(synthesize_png(ids)).collect()
    }
    assert ph == ph2  # deterministic across runs
    assert ph[1] != ph[2]
