"""Minimal pure-Python PNG codec (stdlib zlib/struct + NumPy only).

The multimodal tier (operators/multimodal.py) kept its real-codec slot as
an env-guarded NotImplementedError because no image library ships in this
container. PNG, however, needs none: the format is zlib-compressed
filtered scanlines (RFC 2083), entirely decodable with the stdlib. This
module makes the real-decode path exercisable offline — a genuine codec,
not a fake: it inflates IDAT, reverses all five scanline filters
(None/Sub/Up/Average/Paeth), and returns the true pixel array.

Scope (explicit, checked): 8-bit depth, color types 0 (grayscale),
2 (RGB), 6 (RGBA), no interlacing. Anything else raises ValueError — the
caller's import-try/fake fallback contract is unchanged. The encoder
exists so tests and fixtures can round-trip known pixels without any
external tool.

Used by multimodal.decode_image as the PIL-less fallback, which is what
lets extract_features/resize_images run fake=False end-to-end in this
container (round-9 verdict task #4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale, (h, w, 3) RGB, or (h, w, 4) RGBA → PNG
    bytes (filter type 0 per scanline — valid, universally decodable)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (h, w) for grayscale, (h, w, ch) for
    RGB/RGBA. Supports 8-bit non-interlaced color types 0/2/6; raises
    ValueError otherwise."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _CHANNELS or comp != 0 or filt != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color}) — this "
            "minimal codec handles 8-bit gray/RGB/RGBA only")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:
            cur = line
        elif ftype == 1:      # Sub
            cur = line
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif ftype == 2:      # Up
            cur = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 3:      # Average
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                cur[i] = (cur[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:      # Paeth
            cur = line
            for i in range(stride):
                left = int(cur[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
