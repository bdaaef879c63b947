"""Pure-stdlib RIFF/WAVE PCM codec — the audio twin of png_codec.

Round-10 proved the pattern with PNG (zlib + scanline filters); WAV PCM
is even simpler: a RIFF container with an `fmt ` chunk and raw
little-endian PCM frames in `data`. Python's stdlib `wave` module reads
and writes it with zero third-party dependencies, which makes a REAL
audio decode tier possible in this container (no libsndfile/ffmpeg) —
the env-guard stays only for compressed formats.

Scope: 16-bit signed PCM, mono (the tier contract in
operators/multimodal.extract_audio_features). The codec is lossless, so
decode(encode(x)) == x exactly — the property that lets the fake=False
audio feature path be hash-gated against a DuckDB byte-arithmetic replay
that never sees the codec (queries_multimodal.multimodal_audio_real).
"""

from __future__ import annotations

import io
import wave

import numpy as np

DEFAULT_RATE = 8000


def is_wav(payload: bytes) -> bool:
    """RIFF/WAVE magic probe (container only — codec checked on decode)."""
    return len(payload) >= 12 and payload[:4] == b"RIFF" \
        and payload[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, rate: int = DEFAULT_RATE) -> bytes:
    """int16 mono sample array -> RIFF/WAVE PCM bytes (lossless)."""
    arr = np.asarray(samples)
    if arr.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {arr.dtype}")
    if arr.ndim != 1:
        raise ValueError("mono (1-D) samples only")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(arr.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (int16 mono samples, rate). 16-bit PCM
    only; multi-channel input is averaged down to mono (integer floor
    division — deterministic)."""
    if not is_wav(bytes(payload)):
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"{8 * w.getsampwidth()}-bit PCM unsupported (16-bit only)")
        n_ch = w.getnchannels()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    arr = np.frombuffer(frames, dtype="<i2")
    if n_ch > 1:
        arr = (arr.reshape(-1, n_ch).astype(np.int32).sum(axis=1)
               // n_ch).astype(np.int16)
    return arr.astype(np.int16), rate
