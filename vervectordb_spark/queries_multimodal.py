"""Multimodal query registrations.

The media table derives deterministically from the documents fixture
(operators/multimodal.attach_fake_media: payload = utf-8 text bytes), so
binary-column plumbing gets real oracle coverage:

  multimodal_profile       metadata + payload integrity (md5 over the BLOB
                           == DuckDB md5 over the source VARCHAR, byte-
                           identical for utf-8)
  multimodal_frame_sample  video frame-explosion row counts (integer math
                           twin)
  multimodal_features      mapInPandas feature extraction — rows-only check
                           (the Arrow batch pipeline; histogram parity in
                           pytest instead of SQL)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.operators import multimodal as MM
from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table

_KIND_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' "
    "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)


@query(
    "multimodal_profile",
    oracle=f"""
SELECT doc_id AS media_id,
  {_KIND_SQL} AS kind,
  'x-fake/' || {_KIND_SQL} AS mime,
  (doc_id % 640 + 32)::INT AS width,
  octet_length(encode(text)) AS n_bytes,
  md5(text) AS payload_md5
FROM documents
""",
)
def multimodal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed struct metadata: filters/projections touch
    only the struct fields (columnar, pushdown-able); the payload is
    checksummed without ever being parsed by Catalyst."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_fake_media(docs)
    return media.select(
        "media_id",
        "kind",
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
SELECT doc_id AS media_id,
  ((greatest(octet_length(encode(text)) // 16, 1) + 3) // 4) AS n_frames
FROM documents
WHERE doc_id % 3 = 2
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 4th 16-byte frame): the row-explosion
    count per media is pure integer math, so the fan-out is oracle-checked
    even though frame payloads stay binary."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_fake_media(docs)
    frames = MM.sample_frames(media, every_n=4, frame_size=16)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_frames"))


@query("multimodal_features")  # rows-only: Arrow plumbing; values pytest-gated
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_fake_media(docs)
    feats = MM.extract_features(media, dim=64, fake=True)
    return feats.select(
        "media_id",
        F.size("features").alias("dim"),
        F.round(
            F.aggregate(
                F.col("features").cast("array<double>"),
                F.lit(0.0), lambda a, x: a + x,
            ),
            6,
        ).alias("mass"),  # histogram is normalized: mass == 1.0 per row
    )
