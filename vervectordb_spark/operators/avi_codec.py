"""Pure-stdlib RIFF/AVI codec for UNCOMPRESSED 8-bit grayscale video —
the video member of the png_codec / wav_codec family.

AVI is the same RIFF container WAV uses: a 'hdrl' LIST with the main
header (avih) and one video stream (strl = strh 'vids' + strf
BITMAPINFOHEADER), then a 'movi' LIST whose '00db' chunks are
uncompressed device-independent bitmaps (BI_RGB). For 8-bit frames each
pixel is one palette index; with the identity grayscale palette the
frame bytes ARE the luminance values, stored bottom-up with rows padded
to 4 bytes — all parseable with `struct`, zero third-party deps.

Lossless by construction, so decode(encode(x)) == x exactly — the
property that lets the fake=False video frame path be hash-gated
against a DuckDB byte-arithmetic replay that never sees the codec
(queries_multimodal.multimodal_video_real). Compressed codecs (the
ffmpeg domain) stay honestly env-guarded in operators/multimodal.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" \
        and payload[8:12] == b"AVI "


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n_frames, h, w) uint8 grayscale -> uncompressed 8-bit AVI bytes
    (identity gray palette, bottom-up rows padded to 4 bytes)."""
    arr = np.asarray(frames)
    if arr.dtype != np.uint8 or arr.ndim != 3:
        raise ValueError("expected (n, h, w) uint8 frames")
    n, h, w = arr.shape
    stride = _pad4(w)
    frame_size = stride * h

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) % 2 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    # BITMAPINFOHEADER + 256-entry identity grayscale palette (BGR0)
    bmih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_size,
                       0, 0, 256, 256)
    palette = b"".join(struct.pack("<BBBB", i, i, i, 0)
                       for i in range(256))
    strf = chunk(b"strf", bmih + palette)
    strh = chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0, 0, 0,
        1, int(fps), 0, n, frame_size, 0, 0, 0, 0, w, h))
    avih = chunk(b"avih", struct.pack(
        "<IIIIIIIIIIIIII", 1_000_000 // max(int(fps), 1), 0, 0, 0x10,
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))

    movi_body = b""
    for f in range(n):
        rows = arr[f]
        # bottom-up, rows padded to the 4-byte stride
        body = b"".join(
            rows[r].tobytes() + b"\x00" * (stride - w)
            for r in range(h - 1, -1, -1))
        movi_body += chunk(b"00db", body)
    movi = lst(b"movi", movi_body)

    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _iter_chunks(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield tag, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed 8-bit AVI bytes -> ((n, h, w) uint8 frames, fps).
    BI_RGB 8-bit only; anything compressed raises NotImplementedError
    (the honest env-guard boundary)."""
    buf = bytes(payload)
    if not is_avi(buf):
        raise ValueError("not a RIFF/AVI payload")
    w = h = bit_count = compression = 0
    rate = scale = 1
    frames: list[np.ndarray] = []

    def walk(start: int, end: int) -> None:
        nonlocal w, h, bit_count, compression, rate, scale
        for tag, body_at, size in _iter_chunks(buf, start, end):
            if tag == b"LIST":
                walk(body_at + 4, body_at + size)
            elif tag == b"strh":
                fcc_type, _h, _f, _p, _l, _i, sc, rt = struct.unpack_from(
                    "<4s4sIHHIII", buf, body_at)
                if fcc_type == b"vids":
                    scale, rate = max(sc, 1), rt
            elif tag == b"strf" and w == 0:
                (_sz, w, h, _pl, bit_count, compression) = \
                    struct.unpack_from("<IiiHHI", buf, body_at)
            elif tag in (b"00db", b"00dc"):
                if compression != 0 or bit_count != 8:
                    raise NotImplementedError(
                        "only uncompressed 8-bit AVI is decodable "
                        "without ffmpeg (compression="
                        f"{compression}, bits={bit_count})")
                stride = _pad4(w)
                raw = np.frombuffer(
                    buf, dtype=np.uint8, count=stride * abs(h),
                    offset=body_at).reshape(abs(h), stride)[:, :w]
                # bottom-up unless height is negative (top-down DIB)
                frames.append(raw[::-1] if h > 0 else raw)

    walk(12, len(buf))
    if w == 0 or not frames:
        raise ValueError("no decodable video stream found")
    fps = max(1, round(rate / scale)) if rate else 1
    return np.stack(frames), fps
