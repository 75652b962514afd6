"""Binary YSON codec (the reference's native serialization, text+binary).

YSON is the reference's universal value language: scalars, lists, maps and
an ``entity`` (null) literal, with an optional attribute map attached to any
node. The *binary* form tags scalars with one marker byte and varint-encodes
lengths/integers; structural characters (``[ ] { } ; =``) are the same ASCII
bytes as in the text form.

Wire constants (reference ``yt/go/yson/scanner.go:56-63``; the C++ lexer
mirrors them in ``yt/yt/core/yson/detail.h``):

==========  ====  =====================================================
marker      byte  payload
==========  ====  =====================================================
string      0x01  zigzag-varint byte-length, then raw bytes
int64       0x02  zigzag-varint value
double      0x03  8 bytes IEEE-754 little-endian
false       0x04  —
true        0x05  —
uint64      0x06  unsigned varint value
entity      '#'   — (null)
list        '['   items separated/terminated by ';', closed by ']'
map         '{'   ``key '=' value ';'`` entries, closed by '}'
attributes  '<'   same as map, closed by '>', prefixes the attributed node
==========  ====  =====================================================

This module implements ``dumps``/``loads`` for the binary form over plain
Python values (None/bool/int/float/str/bytes/list/dict). It exists for the
Skiff ``yson32`` wire slot (nested columns) and for round-tripping the
reference's "Any" column payloads; it is pure interchange code, never on
the analytics hot path (queries keep Any columns as JSON + JVM-side
getters — see ``functions/ql.py``).
"""

from __future__ import annotations

import struct

_STRING = 0x01
_INT64 = 0x02
_DOUBLE = 0x03
_FALSE = 0x04
_TRUE = 0x05
_UINT64 = 0x06
_ENTITY = ord("#")
_LIST_OPEN = ord("[")
_LIST_CLOSE = ord("]")
_MAP_OPEN = ord("{")
_MAP_CLOSE = ord("}")
_SEP = ord(";")
_KV = ord("=")

_INT64_MAX = (1 << 63) - 1
_UINT64_MAX = (1 << 64) - 1


def _write_uvarint(out: bytearray, value: int) -> None:
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_varint(out: bytearray, value: int) -> None:
    # zigzag: maps signed to unsigned so small negatives stay short
    _write_uvarint(out, (value << 1) ^ (value >> 63) if value >= 0 else ((-value) << 1) - 1)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    u, pos = _read_uvarint(data, pos)
    return (u >> 1) ^ -(u & 1), pos


def _dump(value, out: bytearray) -> None:
    if value is None:
        out.append(_ENTITY)
    elif value is True:
        out.append(_TRUE)
    elif value is False:
        out.append(_FALSE)
    elif isinstance(value, int):
        if value > _UINT64_MAX or value < -(1 << 63):
            raise ValueError(f"integer out of 64-bit range: {value}")
        if value > _INT64_MAX:
            out.append(_UINT64)
            _write_uvarint(out, value)
        else:
            out.append(_INT64)
            _write_varint(out, value)
    elif isinstance(value, float):
        out.append(_DOUBLE)
        out += struct.pack("<d", value)
    elif isinstance(value, (str, bytes)):
        raw = value.encode("utf-8") if isinstance(value, str) else value
        out.append(_STRING)
        _write_varint(out, len(raw))
        out += raw
    elif isinstance(value, (list, tuple)):
        out.append(_LIST_OPEN)
        for item in value:
            _dump(item, out)
            out.append(_SEP)
        out.append(_LIST_CLOSE)
    elif isinstance(value, dict):
        out.append(_MAP_OPEN)
        for key, item in value.items():
            if not isinstance(key, (str, bytes)):
                raise TypeError(f"YSON map keys must be strings, got {type(key).__name__}")
            _dump(key, out)
            out.append(_KV)
            _dump(item, out)
            out.append(_SEP)
        out.append(_MAP_CLOSE)
    else:
        raise TypeError(f"cannot serialize {type(value).__name__} to YSON")


def dumps(value) -> bytes:
    """Serialize a Python value to binary YSON."""
    out = bytearray()
    _dump(value, out)
    return bytes(out)


def _load(data: bytes, pos: int, *, binary_strings: bool):
    marker = data[pos]
    pos += 1
    if marker == _ENTITY:
        return None, pos
    if marker == _TRUE:
        return True, pos
    if marker == _FALSE:
        return False, pos
    if marker == _INT64:
        return _read_varint(data, pos)
    if marker == _UINT64:
        return _read_uvarint(data, pos)
    if marker == _DOUBLE:
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if marker == _STRING:
        length, pos = _read_varint(data, pos)
        raw = data[pos : pos + length]
        return (bytes(raw) if binary_strings else raw.decode("utf-8")), pos + length
    if marker == _LIST_OPEN:
        items = []
        while data[pos] != _LIST_CLOSE:
            item, pos = _load(data, pos, binary_strings=binary_strings)
            items.append(item)
            if data[pos] == _SEP:
                pos += 1
        return items, pos + 1
    if marker == _MAP_OPEN:
        entries = {}
        while data[pos] != _MAP_CLOSE:
            key, pos = _load(data, pos, binary_strings=binary_strings)
            if isinstance(key, bytes):
                key = key.decode("utf-8")
            if data[pos] != _KV:
                raise ValueError(f"malformed YSON map at byte {pos}")
            value, pos = _load(data, pos + 1, binary_strings=binary_strings)
            entries[key] = value
            if data[pos] == _SEP:
                pos += 1
        return entries, pos + 1
    raise ValueError(f"unknown YSON marker 0x{marker:02x} at byte {pos - 1}")


def loads(data: bytes, *, binary_strings: bool = False):
    """Parse one binary-YSON value; raises on trailing bytes.

    ``binary_strings=True`` returns strings as ``bytes`` (YSON strings are
    byte strings; utf-8 decoding is a convenience default).
    """
    value, pos = _load(data, 0, binary_strings=binary_strings)
    if pos != len(data):
        raise ValueError(f"trailing bytes after YSON value at byte {pos}")
    return value


def loads_prefix(data: bytes, pos: int = 0, *, binary_strings: bool = False):
    """Parse one value starting at ``pos``; returns ``(value, next_pos)``.

    The streaming entry point used by the Skiff ``yson32`` field decoder.
    """
    return _load(data, pos, binary_strings=binary_strings)
