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


def test_fake_false_raises_honest_stub_error(spark):
    """fake=False is an env-guarded stub: it must raise NotImplementedError
    up front (the old empty-bytes probe crashed inside PIL when the lib
    WAS installed, then computed fake features anyway)."""
    from vervectordb_spark.operators.multimodal import (
        attach_fake_media,
        extract_features,
    )

    media = attach_fake_media(
        spark.createDataFrame([(0, "x")], "doc_id long, text string")
    )
    with pytest.raises(NotImplementedError, match="fake=True"):
        extract_features(media, fake=False)
