"""Multimodal plumbing tests: binary columns, Arrow-batched decode stages,
frame explosion, stubbed real codecs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.operators import multimodal as MM
from vervectordb_spark.schema import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(60)
    return MM.attach_fake_media(docs).cache()


def test_media_schema(media):
    s = dict((f.name, f.dataType.simpleString()) for f in media.schema)
    assert s["payload"] == "binary"
    assert s["meta"].startswith("struct<mime:string")
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_payload_roundtrips_bytes(media, spark):
    docs = load_table(spark, SF_DIR, "documents").limit(60)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in media.limit(10).collect():
        assert bytes(r["payload"]) == texts[r["media_id"]].encode("utf-8")


def test_extract_features_histogram(media):
    out = MM.extract_features(media, dim=64, fake=True)
    rows = out.select("media_id", "payload", "features").limit(5).collect()
    for r in rows:
        feats = np.asarray(r["features"])
        assert feats.shape == (64,)
        buf = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        hist, _ = np.histogram(buf, bins=64, range=(0, 256))
        expected = (hist / hist.sum()).astype(np.float32)
        assert np.allclose(feats, expected)


def test_features_feed_vector_search(media):
    """Extracted features are directly searchable — the multimodal→vector
    handoff (features column == embedding column contract)."""
    from vervectordb_spark.operators.search import brute_force_topk

    feats = MM.extract_features(media, dim=64, fake=True).select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    ).cache()
    q = feats.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    out = brute_force_topk(feats, [float(x) for x in q], top_k=3).collect()
    assert out[0]["vec_id"] == 0 and abs(out[0]["sim"] - 1.0) < 1e-9


def test_resize_contract(media):
    out = MM.resize_images(media, h=8, w=8, fake=True)
    rows = out.select("resized", "resized_h", "resized_w").limit(3).collect()
    for r in rows:
        assert len(bytes(r["resized"])) == 64
        assert (r["resized_h"], r["resized_w"]) == (8, 8)


def test_frame_sample_counts(media):
    frames = MM.sample_frames(media, every_n=4, frame_size=16)
    counts = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    vids = {r["media_id"]: len(bytes(r["payload"]))
            for r in media.filter(F.col("kind") == "video").collect()}
    assert set(counts) == set(vids)
    for mid, nbytes in vids.items():
        n_frames = max(nbytes // 16, 1)
        assert counts[mid] == (n_frames + 3) // 4


def test_real_decode_is_stubbed():
    try:
        import PIL  # noqa: F401
        pytest.skip("codec present; stub not reachable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="codec"):
        MM.decode_image(b"\x89PNG")


def test_attach_fake_media_null_text_payload(spark):
    """NULL text must land as an EMPTY payload (schema forbids null), and
    the feature kernel must process it."""
    from vervectordb_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    df = spark.createDataFrame([(0, None), (1, "abc")],
                               "doc_id long, text string")
    media = attach_fake_media(df)
    assert media.filter(F.col("payload").isNull()).count() == 0
    feats = extract_features(media).collect()
    assert len(feats) == 2


def test_fake_false_video_on_non_avi_payload_fails_honestly(spark):
    """The env-guard boundary moved INTO the codec (r11): fake=False
    video now decodes real uncompressed AVI, so a non-AVI payload
    surfaces the honest no-codec error at execution time instead of an
    up-front stub. (Image r10, audio+video r11 are all real tiers now;
    only COMPRESSED codecs remain guarded.)"""
    from vervectordb_spark.operators.multimodal import (
        attach_fake_media,
        sample_frames,
    )

    media = attach_fake_media(  # doc_id 2 -> kind 'video'
        spark.createDataFrame([(2, "x" * 40)], "doc_id long, text string")
    )
    out = sample_frames(media, fake=False)  # lazy: builds fine
    with pytest.raises(Exception, match="not a RIFF/AVI payload"):
        out.collect()


def test_fake_false_non_png_payload_fails_at_execution(spark):
    """A non-PNG payload in the real image path surfaces the honest
    no-codec error at execution time (PIL absent, pure codec is
    PNG-only)."""
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present; non-PNG payloads decodable")
    except ImportError:
        pass
    from vervectordb_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    media = attach_fake_media(
        spark.createDataFrame([(0, "x")], "doc_id long, text string")
    )
    with pytest.raises(Exception, match="no codec|NotImplementedError"):
        extract_features(media, fake=False).collect()


# ---------------------------------------------------------------------------
# real image codec: vendored pure-Python PNG (round-10 task #4)
# ---------------------------------------------------------------------------


def test_png_roundtrip_all_shapes():
    import numpy as np

    from vervectordb_spark.operators.png_codec import decode_png, encode_png

    rng = np.random.default_rng(3)
    for shape in [(1, 1), (5, 7), (16, 16), (8, 8, 3), (3, 4, 4)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = decode_png(encode_png(a))
        assert b.shape == a.shape and (a == b).all()


def test_png_decoder_reverses_every_filter_type():
    """The decoder must undo all five scanline filters — the encoder only
    emits filter 0, so construct filtered scanlines by applying each
    filter FORWARD per the spec and assert the decoder recovers the
    image."""
    import struct
    import zlib

    import numpy as np

    from vervectordb_spark.operators import png_codec as P

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int16)
    raws = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int16)
        enc = np.empty(stride, dtype=np.int16)
        for i in range(stride):
            left = cur[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (int(left) + int(up)) >> 1
            else:
                pred = P._paeth(int(left), int(up), int(ul))
            enc[i] = (cur[i] - pred) & 0xFF
        raws.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    payload = (P._SIG + P._chunk(b"IHDR", ihdr)
               + P._chunk(b"IDAT", zlib.compress(b"".join(raws)))
               + P._chunk(b"IEND", b""))
    out = P.decode_png(payload)
    assert (out == img).all()


def test_real_feature_extraction_on_png_media(spark):
    """fake=False end to end in THIS container: real PNG payloads
    (attach_png_media) are decoded by the vendored codec and the feature
    histogram matches an independent hand computation over the tile."""
    import numpy as np

    from vervectordb_spark.operators.multimodal import (
        attach_png_media,
        extract_features,
    )

    df = spark.createDataFrame([(7, "abcabz"), (8, None)],
                               "doc_id long, text string")
    media = attach_png_media(df, h=16, w=16)
    feats = {r["media_id"]: np.array(r["features"]) for r in
             extract_features(media, dim=64, fake=False).collect()}
    raw = b"abcabz"
    tile = np.frombuffer(
        (raw * (256 // len(raw) + 1))[:256], dtype=np.uint8)
    exp, _ = np.histogram(tile, bins=64, range=(0, 256))
    assert np.allclose(feats[7], (exp / 256).astype(np.float32))
    z = np.zeros(64)
    z[0] = 1.0                       # NULL text -> all-zero-byte tile
    assert np.allclose(feats[8], z)


def test_real_resize_on_png_media(spark):
    """fake=False resize decodes the real PNG and nearest-neighbor maps
    to (h, w) — identical output schema to the fake path."""
    from vervectordb_spark.operators.multimodal import (
        attach_png_media,
        resize_images,
    )

    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    media = attach_png_media(df, h=16, w=16)
    real = resize_images(media, h=4, w=4, fake=False)
    fake = resize_images(media, h=4, w=4, fake=True)
    assert real.schema == fake.schema
    r = real.collect()[0]
    assert r["resized_h"] == 4 and r["resized_w"] == 4
    assert len(bytes(r["resized"])) == 16


# ---------------------------------------------------------------------------
# WAV/PCM real audio tier (operators/wav_codec, r11)
# ---------------------------------------------------------------------------


def test_wav_roundtrip_exact():
    from vervectordb_spark.operators.wav_codec import (
        decode_wav, encode_wav, is_wav)

    for s in [np.zeros(0, dtype=np.int16),
              np.array([32767, -32768, 0, -1, 1], dtype=np.int16),
              (np.arange(1000) * 37 % 65536 - 32768).astype(np.int16)]:
        b = encode_wav(s, rate=16000)
        assert is_wav(b)
        d, rate = decode_wav(b)
        assert rate == 16000
        assert d.dtype == np.int16 and (d == s).all()


def test_wav_decode_rejects_non_pcm16_and_non_wav():
    import io
    import wave

    import pytest as _pt

    from vervectordb_spark.operators.wav_codec import decode_wav

    with _pt.raises(ValueError):
        decode_wav(b"not a wav at all")
    buf = io.BytesIO()                      # 8-bit PCM: honest reject
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(bytes(range(16)))
    with _pt.raises(NotImplementedError):
        decode_wav(buf.getvalue())


def test_wav_stereo_downmixes_deterministically():
    import io
    import wave

    from vervectordb_spark.operators.wav_codec import decode_wav

    left = np.array([100, -100, 7], dtype=np.int16)
    right = np.array([200, -300, 8], dtype=np.int16)
    inter = np.empty(6, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(inter.astype("<i2").tobytes())
    d, _ = decode_wav(buf.getvalue())
    # integer floor-division mean — deterministic
    exp = (left.astype(np.int32) + right.astype(np.int32)) // 2
    assert (d == exp.astype(np.int16)).all()


def test_audio_real_tier_equals_fake_tier_on_same_bytes(spark):
    """The tier contract: fake features over the RAW text bytes ==
    real features over the WAV encoding of the same tiled samples —
    identical schema AND identical values (PCM is lossless and both
    sides share _tile_samples)."""
    from vervectordb_spark.operators.multimodal import (
        attach_fake_media, attach_wav_media, extract_audio_features)

    rows = [(1, "hello world"), (2, ""), (3, None),
            (4, "\x00\x1f mixed bytes é 一"), (5, "x" * 500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wav = attach_wav_media(df)
    real = extract_audio_features(wav, fake=False)
    fake_media = attach_fake_media(df).select("media_id", "payload")
    fake = extract_audio_features(fake_media, fake=True)
    assert real.schema["features"] == fake.schema["features"]
    rf = {r["media_id"]: list(r["features"]) for r in real.collect()}
    ff = {r["media_id"]: list(r["features"]) for r in fake.collect()}
    assert rf == ff
    assert len(rf[1]) == 32
    # empty/NULL text -> silent signal: zero energy, zero crossings
    assert rf[2] == [0.0] * 32 and rf[3] == [0.0] * 32


# ---------------------------------------------------------------------------
# AVI real video tier (operators/avi_codec, r11)
# ---------------------------------------------------------------------------


def test_avi_roundtrip_exact_all_shapes():
    from vervectordb_spark.operators.avi_codec import (
        decode_avi, encode_avi, is_avi)

    rng = np.random.RandomState(0)
    for shape in [(1, 4, 4), (3, 8, 5), (5, 16, 16), (2, 7, 3)]:
        f = rng.randint(0, 256, shape).astype(np.uint8)
        b = encode_avi(f, fps=12)
        assert is_avi(b)
        d, fps = decode_avi(b)
        assert fps == 12
        assert d.shape == f.shape and (d == f).all(), shape


def test_avi_decode_rejects_compressed_and_non_avi():
    import struct

    import pytest as _pt

    from vervectordb_spark.operators.avi_codec import (
        decode_avi, encode_avi)

    with _pt.raises(ValueError):
        decode_avi(b"definitely not avi")
    # flip the strf compression field to MJPG: honest env-guard error
    good = bytearray(encode_avi(np.zeros((1, 4, 4), dtype=np.uint8)))
    at = good.find(b"strf") + 8 + 16  # biCompression offset in BMIH
    good[at:at + 4] = struct.pack("<I", 0x47504A4D)
    with _pt.raises(NotImplementedError):
        decode_avi(bytes(good))


def test_video_real_tier_matches_tile_rule(spark):
    """fake=False frame sampling over real AVI payloads recovers exactly
    the deterministic byte-tile frames (container parse + bottom-up
    unpadding proven lossless), with the fake path's schema."""
    from vervectordb_spark.operators.multimodal import (
        _tile_frame, attach_avi_media, attach_fake_media, sample_frames)

    rows = [(1, "hello world"), (2, ""), (3, None), (5, "x" * 300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = attach_avi_media(df, n_frames=6, h=8, w=8)
    real = sample_frames(media, every_n=2, fake=False)
    fake = sample_frames(attach_fake_media(df), every_n=2, fake=True)
    assert real.schema == fake.schema
    got = {(r["media_id"], r["frame_no"]): bytes(r["frame"])
           for r in real.collect()}
    assert len(got) == 4 * 3  # 6 frames, every 2nd, per doc
    for doc_id, txt in rows:
        b = (txt or "").encode("utf-8")
        for f in (0, 2, 4):
            assert got[(doc_id, f)] == _tile_frame(b, f, 8, 8).tobytes()
