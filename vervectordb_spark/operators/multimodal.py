"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not in the reference (text/vector only), required by the north-star
pipeline surface (SURVEY.md §2.8). Design contract:

  * media payloads are `binary` columns; NEVER parsed by Catalyst — they
    flow scan → Arrow batch → Python untouched;
  * typed metadata rides in a struct (mime/width/height/duration_ms) so
    filters/partitioning stay columnar and pushdown-able (`WHERE
    meta.mime = 'image/png'` never touches payload bytes);
  * decode / resize / frame-sample run as mapInPandas over Arrow batches —
    the ONLY sane shape for CPU-heavy per-item work at 100 TB: payload
    bytes stream batch-wise through executors, no shuffle, no driver;
  * ALL THREE modalities decode for REAL in this container, stdlib-only:
    images via the vendored pure-Python PNG codec (operators/png_codec —
    zlib + all five scanline filters; PIL when installed), audio via the
    RIFF/WAVE PCM codec (operators/wav_codec), video via the
    uncompressed RIFF/AVI codec (operators/avi_codec) — each hash-gated
    end to end (multimodal_real_decode / multimodal_audio_real /
    multimodal_video_real: the oracle replays feature values from the
    source bytes and never sees the codec, so a hash match proves
    decode(encode(x)) == x). COMPRESSED codecs (the libsndfile/ffmpeg
    domain) remain honest NotImplementedError guards.
    Every pipeline stage also accepts `fake=True` — a deterministic
    byte-level stand-in — so the oracle-checkable plumbing (schema,
    batching, UDF signatures, partitioning) is engine-replayable.

Scale notes: media rows are large (KB–MB); keep
`spark.sql.files.maxPartitionBytes` at default 128 MB so a partition is
hundreds of items, and repartition by a size-balanced key before CPU-heavy
stages. Feature extraction output (fixed-dim float arrays) feeds directly
into the vector-store operators (search/dedup/IVF/PQ).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", MEDIA_META),
])


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from the documents fixture: the
    payload is the utf-8 text bytes, kind/meta derived from doc_id. Stands
    in for a real (id, bytes) media crawl with identical Spark semantics."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        # NULL text must not become a NULL payload (MEDIA_SCHEMA forbids
        # it and bytes(None) crashes the feature kernels)
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias(
            "payload"
        ),
        F.struct(
            F.concat(F.lit("x-fake/"), kind).alias("mime"),
            (F.col(id_col) % 640 + 32).cast("int").alias("width"),
            (F.col(id_col) % 480 + 32).cast("int").alias("height"),
            (F.col(id_col) % 60000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decode stages — real codecs stubbed, deterministic fakes for the plumbing
# ---------------------------------------------------------------------------


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode. Preference order: PIL when installed (any
    format), else the vendored pure-Python PNG codec (8-bit gray/RGB/
    RGBA — operators/png_codec, stdlib-only so it works in THIS
    container). Non-PNG payloads without PIL raise NotImplementedError,
    preserving the honest env-guard for formats we truly can't decode."""
    data = bytes(payload)
    try:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)))
    except ImportError:
        pass
    from vervectordb_spark.operators.png_codec import decode_png, is_png

    if is_png(data):
        return decode_png(data)
    raise NotImplementedError(
        "no codec for this payload in this environment (pure-Python "
        "path handles PNG only); use fake=True for the byte-level "
        "stand-in"
    )


def _to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w[, ch]) uint8 → (h, w) uint8 luminance (channel mean —
    deterministic, library-free)."""
    if img.ndim == 2:
        return img
    return img.astype(np.uint16).mean(axis=2).astype(np.uint8)


def _fake_decode(payload: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in: tile payload bytes into an (h, w) 'pixel'
    grid. Same dtype/shape contract as a real decode."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = int(np.ceil(h * w / buf.size))
    return np.tile(buf, reps)[: h * w].reshape(h, w)


def attach_png_media(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", h: int = 16,
                     w: int = 16) -> DataFrame:
    """(media_id, payload) with REAL PNG payloads: the deterministic
    byte-tile pixels (same tiling rule as _fake_decode — flat index j
    holds text byte j % len, zero byte for empty/NULL text) encoded with
    the vendored pure-Python codec. Because PNG is lossless, a pipeline
    that decodes these with the REAL codec recovers exactly the tile —
    which is what lets the fake=False feature path be hash-gated against
    a DuckDB byte-arithmetic replay (queries_multimodal.
    multimodal_real_decode) instead of rows-only."""
    from vervectordb_spark.operators.png_codec import encode_png

    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"media_id {id_type}, payload binary"

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_png(_fake_decode((t or "").encode("utf-8"), h, w))
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col],
                                "payload": payloads})

    return docs.select(id_col, text_col).mapInPandas(enc, out_schema)


def _tile_samples(payload: bytes, n: int) -> np.ndarray:
    """Deterministic byte → int16 sample rule shared by the fake audio
    tier and attach_wav_media: sample j = (byte[j % L] - 128) * 256
    (all-zero for an empty payload). The SAME rule on both sides is what
    makes fake(text bytes) == real(decode(wav-of-those-bytes)) an exact
    equality, pytest-pinned."""
    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
    if buf.size == 0:
        return np.zeros(n, dtype=np.int16)
    idx = np.arange(n) % buf.size
    return ((buf[idx].astype(np.int16) - 128) * 256).astype(np.int16)


def attach_wav_media(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n_samples: int = 256,
                     rate: int = 8000) -> DataFrame:
    """(media_id, payload) with REAL RIFF/WAVE PCM payloads: the
    deterministic byte-tile samples (_tile_samples over the utf-8 text
    bytes) encoded with the stdlib codec (operators/wav_codec). PCM is
    lossless, so a pipeline that decodes these with the REAL codec
    recovers exactly the sample stream — which lets the fake=False audio
    feature path be hash-gated against a DuckDB byte-arithmetic replay
    (queries_multimodal.multimodal_audio_real), the attach_png_media
    pattern for the audio modality."""
    from vervectordb_spark.operators.wav_codec import encode_wav

    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"media_id {id_type}, payload binary"

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = [
                encode_wav(_tile_samples((t or "").encode("utf-8"),
                                         n_samples), rate)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({"media_id": pdf[id_col],
                                "payload": payloads})

    return docs.select(id_col, text_col).mapInPandas(enc, out_schema)


def extract_audio_features(media: DataFrame, n_frames: int = 16,
                           frame_len: int = 16, fake: bool = True,
                           payload_col: str = "payload") -> DataFrame:
    """Per-item audio features via mapInPandas: payload → fixed-dim
    float array of [per-frame mean-square energy ; per-frame zero
    crossings] (2*n_frames values). fake=True derives pseudo-samples
    from the RAW payload bytes with _tile_samples (deterministic,
    format-agnostic); fake=False DECODES real RIFF/WAVE PCM
    (operators/wav_codec) and features the true sample stream — same
    output schema and batch shape (the tier-parity contract).

    Arithmetic is exact-replayable: samples are int16, per-frame energy
    is an exact int64 sum of squares divided by 2^30 * frame_len (a
    power of two for frame_len 16 — exact in float64), zero crossings
    are integer counts; float32 is the only rounding step, mirrored by
    the oracle's ::REAL cast."""
    n = n_frames * frame_len
    denom = float((1 << 30) * frame_len)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in media.schema)
    out_schema = f"{fields}, features array<float>"

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        from vervectordb_spark.operators.wav_codec import decode_wav

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf[payload_col]:
                if fake:
                    s = _tile_samples(bytes(payload), n)
                else:
                    s, _rate = decode_wav(bytes(payload))
                    if s.size < n:      # pad/truncate to the frame grid
                        s = np.pad(s, (0, n - s.size))
                    else:
                        s = s[:n]
                fr = s.astype(np.int64).reshape(n_frames, frame_len)
                energy = (fr * fr).sum(axis=1).astype(np.float64) / denom
                sign = np.sign(fr)
                zc = ((sign[:, 1:] * sign[:, :-1]) < 0).sum(axis=1)
                feats.append(np.concatenate(
                    [energy, zc.astype(np.float64)]).astype(np.float32))
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return media.mapInPandas(extract, out_schema)


def extract_features(media: DataFrame, dim: int = 64, fake: bool = True,
                     payload_col: str = "payload") -> DataFrame:
    """Per-item feature vector via mapInPandas: payload bytes → fixed-dim
    float array. fake=True histograms the RAW bytes (deterministic,
    format-agnostic — the oracle-gated path); fake=False DECODES the
    image first (PIL or the vendored PNG codec) and histograms the true
    pixel intensities — identical output schema and batch shape, which
    is the parity the tier contract pins in pytest."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema)
    out_schema = f"{fields}, features array<float>"

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf[payload_col]:
                if fake:
                    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                else:
                    buf = _to_gray(decode_image(payload)).ravel()
                hist, _ = np.histogram(buf, bins=dim, range=(0, 256))
                total = hist.sum()
                feats.append(
                    (hist / total if total else hist).astype(np.float32)
                )
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return media.mapInPandas(extract, out_schema)


def resize_images(media: DataFrame, h: int = 8, w: int = 8,
                  fake: bool = True) -> DataFrame:
    """Resize stage: payload → (h, w) grayscale grid → re-serialized
    bytes. fake=True tiles the raw bytes (byte-level stand-in); fake=False
    decodes the real image (PIL or the vendored PNG codec) and resizes by
    nearest-neighbor index mapping — same output schema either way."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in media.schema)
    out_schema = f"{fields}, resized binary, resized_h int, resized_w int"

    def _real_resize(payload: bytes) -> bytes:
        g = _to_gray(decode_image(payload))
        ys = np.minimum((np.arange(h) * g.shape[0]) // h, g.shape[0] - 1)
        xs = np.minimum((np.arange(w) * g.shape[1]) // w, g.shape[1] - 1)
        return g[np.ix_(ys, xs)].tobytes()

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf["resized"] = [
                (_fake_decode(bytes(p), h, w).tobytes() if fake
                 else _real_resize(bytes(p)))
                for p in pdf["payload"]
            ]
            pdf["resized_h"] = h
            pdf["resized_w"] = w
            yield pdf

    return media.mapInPandas(resize, out_schema)


def _tile_frame(payload: bytes, f: int, h: int, w: int) -> np.ndarray:
    """Frame f of the deterministic byte-tile video: flat pixel k of
    frame f holds payload byte (f*h*w + k) % L (zeros for an empty
    payload) — _fake_decode's tiling rule extended with a per-frame
    offset, shared by attach_avi_media and the fake video tier."""
    buf = np.frombuffer(bytes(payload), dtype=np.uint8)
    if buf.size == 0:
        return np.zeros((h, w), dtype=np.uint8)
    idx = (f * h * w + np.arange(h * w)) % buf.size
    return buf[idx].reshape(h, w)


def attach_avi_media(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n_frames: int = 6,
                     h: int = 8, w: int = 8, fps: int = 10) -> DataFrame:
    """(media_id, payload) with REAL uncompressed 8-bit AVI payloads:
    n_frames deterministic byte-tile frames (_tile_frame over the utf-8
    text bytes) encoded with the stdlib RIFF codec
    (operators/avi_codec). Uncompressed DIB frames are lossless, so the
    fake=False frame-sampling path is hash-gateable against a DuckDB
    byte-arithmetic replay (queries_multimodal.multimodal_video_real) —
    the attach_png_media / attach_wav_media pattern for the video
    modality."""
    from vervectordb_spark.operators.avi_codec import encode_avi

    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"media_id {id_type}, payload binary"

    def enc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            payloads = []
            for t in pdf[text_col]:
                b = (t or "").encode("utf-8")
                frames = np.stack([_tile_frame(b, f, h, w)
                                   for f in range(n_frames)])
                payloads.append(encode_avi(frames, fps))
            yield pd.DataFrame({"media_id": pdf[id_col],
                                "payload": payloads})

    return docs.select(id_col, text_col).mapInPandas(enc, out_schema)


def sample_frames(media: DataFrame, every_n: int = 4, frame_size: int = 16,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling: one row per sampled frame (explode pattern).
    fake=True treats the payload as a concatenation of `frame_size`-byte
    frames and keeps every n-th; fake=False DECODES real uncompressed
    8-bit AVI (operators/avi_codec) and emits every n-th true frame's
    grayscale pixels as the frame bytes — identical output schema and
    row-explosion shape (frame_size is ignored: the real frame size
    comes from the stream header). Compressed video still raises the
    honest env-guard, from the codec itself."""
    out_schema = "media_id long, frame_no int, frame binary"

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from vervectordb_spark.operators.avi_codec import decode_avi

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                if fake:
                    n_frames = max(len(buf) // frame_size, 1)
                    for f_no in range(0, n_frames, every_n):
                        rows.append((int(mid), f_no,
                                     buf[f_no * frame_size:
                                         (f_no + 1) * frame_size]))
                else:
                    frames, _fps = decode_avi(buf)
                    for f_no in range(0, len(frames), every_n):
                        rows.append((int(mid), f_no,
                                     frames[f_no].tobytes()))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    src = media
    if "kind" in media.columns:
        src = media.filter(F.col("kind") == "video")
    return src.select("media_id", "payload").mapInPandas(sample, out_schema)
