"""Pure-stdlib PNG codec (encode + decode, 8-bit RGB).

The container has no imaging libraries, but PNG's container format is
zlib (stdlib) + chunk framing + per-scanline filters — all implementable
from the public specification (RFC 2083). This makes the multimodal
decode path REAL in this environment: `operators/multimodal.decode_image`
routes PNG payloads here, with no external dependency.

Scope: 8-bit/channel RGB (color type 2), no interlace — the shape
synthetic fixtures and most ML thumbnails use. All five scanline filters
(None/Sub/Up/Average/Paeth) are supported on decode; encode emits filter
0. Anything else raises ValueError with the unsupported field named.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

__all__ = ["png_encode", "png_decode", "PNG_MAGIC"]

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_BPP = 3  # 8-bit RGB


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw RGB bytes (row-major, 3 bytes/pixel, len == w*h*3) as a
    valid PNG."""
    if len(pixels) != width * height * _BPP:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * _BPP}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * _BPP
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, bytes]:
    """Decode a PNG to (width, height, raw RGB bytes). Supports 8-bit RGB,
    all five scanline filters, no interlace."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad magic)")
    pos, width, height, idat = 8, None, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2:
                raise ValueError(f"unsupported PNG: depth={depth} colortype={ctype}")
            if interlace != 0:
                raise ValueError("unsupported PNG: interlaced")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * _BPP
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, cur = line[0], bytearray(line[1:])
        if ftype == 1:  # Sub
            for i in range(_BPP, stride):
                cur[i] = (cur[i] + cur[i - _BPP]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                cur[i] = (cur[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = cur[i - _BPP] if i >= _BPP else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = cur[i - _BPP] if i >= _BPP else 0
                ul = prev[i - _BPP] if i >= _BPP else 0
                cur[i] = (cur[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out += cur
        prev = bytes(cur)
    return width, height, bytes(out)
