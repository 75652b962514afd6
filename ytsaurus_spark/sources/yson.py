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


# --- text format (yt/yt/core/yson/lexer_detail.h tokenization;
# yt/go/yson/writer.go text emission) ----------------------------------------
#
# Text YSON: maps ``{"k"=v;}``, lists ``[v;v;]``, strings double-quoted with
# C escapes (bare identifiers allowed on input), int64 ``123``, uint64
# ``123u``, double ``3.14`` / ``%nan`` / ``%inf``, booleans ``%true`` /
# ``%false``, entity ``#``, attributes ``<k=v>node`` (parsed and discarded —
# the value model here is plain Python). The dumper always quotes strings
# and terminates every item/pair with ``;`` (the reference writer's
# convention, e.g. ``["foo";"bar";]``).

_BARE_TOKEN_END = set(';=[]{}<>() \t\n\r"')
_IDENT_OK = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-%."
)


class YsonTextError(ValueError):
    pass


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\n\r":
        i += 1
    return i


def _parse_quoted(s: str, i: int) -> tuple[str, int]:
    # i points at the opening quote. Escapes address BYTES (the
    # reference's strings are byte sequences): accumulate as UTF-8
    # bytes so "\xd0\x90" reassembles into 'А'.
    out, i = bytearray(), i + 1
    while i < len(s):
        c = s[i]
        if c == '"':
            return out.decode("utf-8", "surrogateescape"), i + 1
        if c == "\\":
            if i + 1 >= len(s):
                break
            nxt = s[i + 1]
            simple = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
                      "a": "\a", "b": "\b", "f": "\f", "v": "\v", "0": "\0"}
            if nxt in simple:
                out.extend(simple[nxt].encode())
                i += 2
                continue
            if nxt == "x" and i + 3 < len(s):
                out.append(int(s[i + 2:i + 4], 16))
                i += 4
                continue
            out.extend(nxt.encode("utf-8"))
            i += 2
            continue
        out.extend(c.encode("utf-8"))
        i += 1
    raise YsonTextError("unterminated string literal")


def _parse_scalar_token(tok: str):
    if tok == "%true":
        return True
    if tok == "%false":
        return False
    if tok in ("%nan", "%inf", "%-inf"):
        return float(tok[1:].replace("inf", "inf"))
    if tok.endswith("u") and tok[:-1].isdigit():
        return int(tok[:-1])
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        # a double must look numeric — bare words fall through to string
        if any(c.isdigit() for c in tok):
            return float(tok)
    except ValueError:
        pass
    return tok  # bare-word string


def _parse_text(s: str, i: int):
    i = _skip_ws(s, i)
    if i >= len(s):
        raise YsonTextError("unexpected end of YSON text")
    c = s[i]
    if c == "<":  # attribute map: parse to matching '>' and discard
        _, i = _parse_map_body(s, i + 1, closer=">")
        return _parse_text(s, i)
    if c == "{":
        return _parse_map_body(s, i + 1, closer="}")
    if c == "[":
        items, i = [], i + 1
        while True:
            i = _skip_ws(s, i)
            if i >= len(s):
                raise YsonTextError("unterminated list")
            if s[i] == "]":
                return items, i + 1
            v, i = _parse_text(s, i)
            items.append(v)
            i = _skip_ws(s, i)
            if i < len(s) and s[i] == ";":
                i += 1
    if c == '"':
        return _parse_quoted(s, i)
    if c == "#":
        return None, i + 1
    # bare token (number, %bool, bare-word string)
    j = i
    while j < len(s) and s[j] not in _BARE_TOKEN_END:
        if s[j] not in _IDENT_OK and not s[j].isalnum():
            raise YsonTextError(f"unexpected character {s[j]!r} at {j}")
        j += 1
    if j == i:
        raise YsonTextError(f"unexpected character {c!r} at {i}")
    return _parse_scalar_token(s[i:j]), j


def _parse_map_body(s: str, i: int, closer: str):
    out = {}
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise YsonTextError("unterminated map")
        if s[i] == closer:
            return out, i + 1
        if s[i] == '"':
            key, i = _parse_quoted(s, i)
        else:
            j = i
            while j < len(s) and s[j] not in _BARE_TOKEN_END:
                j += 1
            if j == i:
                raise YsonTextError(f"bad map key at {i}")
            key, i = s[i:j], j
        i = _skip_ws(s, i)
        if i >= len(s) or s[i] != "=":
            raise YsonTextError(f"expected '=' after map key {key!r}")
        v, i = _parse_text(s, i + 1)
        out[key] = v
        i = _skip_ws(s, i)
        if i < len(s) and s[i] == ";":
            i += 1


def loads_text(s: str):
    """Parse text-format YSON into plain Python values; raises
    :class:`YsonTextError` on malformed input (incl. trailing junk)."""
    v, i = _parse_text(s, 0)
    if _skip_ws(s, i) != len(s):
        raise YsonTextError(f"trailing characters at {i}")
    return v


_ESCAPES = {"\n": "\\n", "\t": "\\t", "\r": "\\r", '"': '\\"', "\\": "\\\\"}


def _quote(s: str) -> str:
    out = ['"']
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\x{ord(ch):02x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _quote_escaped(s: str) -> str:
    """Standard (non-``unescaped``) text quoting: non-ASCII characters
    escape per UTF-8 BYTE (``\\xd0\\x90`` for А) — the reference's
    default text writer; the ``unescaped_*`` formats keep them verbatim
    (test_common.py::test_unescaped_yson)."""
    out = ['"']
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\x{ord(ch):02x}")
        elif ord(ch) > 0x7E:
            out.extend(f"\\x{b:02x}" for b in ch.encode("utf-8"))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _dump_scalar_text(v, quote=None) -> str:
    quote = quote or _quote
    if v is None:
        return "#"
    if isinstance(v, bool):
        return "%true" if v else "%false"
    if isinstance(v, int):
        return f"{v}u" if v > _INT64_MAX else str(v)
    if isinstance(v, float):
        if v != v:
            return "%nan"
        if v in (float("inf"), float("-inf")):
            return "%inf" if v > 0 else "%-inf"
        return repr(v)
    if isinstance(v, bytes):
        return quote(v.decode("utf-8", "surrogateescape"))
    if isinstance(v, str):
        return quote(v)
    raise TypeError(f"cannot dump {type(v).__name__} as YSON")


def _dump_text(v, out: list, indent: int | None, level: int,
               quote=None) -> None:
    quote = quote or _quote
    nl = "\n" + "    " * (level + 1) if indent is not None else ""
    close_nl = "\n" + "    " * level if indent is not None else ""
    if isinstance(v, dict):
        if not v:
            out.append("{}")
            return
        out.append("{")
        for k, item in v.items():
            out.append(nl)
            out.append(quote(k if isinstance(k, str) else str(k)))
            out.append(" = " if indent is not None else "=")
            _dump_text(item, out, indent, level + 1, quote)
            out.append(";")
        out.append(close_nl)
        out.append("}")
    elif isinstance(v, (list, tuple)):
        if not v:
            out.append("[]")
            return
        out.append("[")
        for item in v:
            out.append(nl)
            _dump_text(item, out, indent, level + 1, quote)
            out.append(";")
        out.append(close_nl)
        out.append("]")
    else:
        out.append(_dump_scalar_text(v, quote))


def dumps_text(v, fmt: str = "text") -> str:
    """Dump plain Python values as text-format YSON. ``fmt`` is ``text``
    (compact: every item ``;``-terminated, strings always quoted),
    ``pretty`` (4-space indented), or their ``unescaped_*`` variants —
    non-ASCII characters stay verbatim instead of escaping per UTF-8
    byte (test_common.py::test_unescaped_yson)."""
    unescaped = fmt.startswith("unescaped_")
    base = fmt.removeprefix("unescaped_")
    out: list = []
    _dump_text(v, out, 4 if base == "pretty" else None, 0,
               _quote if unescaped else _quote_escaped)
    return "".join(out)
