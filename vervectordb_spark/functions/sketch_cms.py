"""Count-min sketch frequency estimation (the heavy-hitter counterpart of
the HLL/GK sketch family in queries_sketch.py).

Spark's `count_min_sketch` aggregate builds the sketch distributedly
(map-side mergeable counter grids — KB-sized state per group at any row
count), but exposes no SQL accessor for estimates, so reading one goes
through the JVM `org.apache.spark.util.sketch.CountMinSketch` object on
the driver. That is a METADATA-sized collect — one serialized sketch
(~eps⁻¹·ln(1/δ) counters), never rows — the same budget as broadcasting a
PQ lookup table.

Guarantees (pytest-asserted, tests/test_sketch_cms.py):
  * no under-count: estimate(x) >= true_count(x) always;
  * bounded over-count: estimate(x) <= true_count(x) + eps·N with
    probability >= confidence;
  * exact mergeability: sketches with the same (eps, confidence, seed)
    merge by counter addition, so estimate(merge(a, b)) == estimate over
    the concatenated input EXACTLY — per-shard/per-day sketch columns are
    pre-aggregable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cms_sketch(df: DataFrame, col: str, eps: float = 0.001,
               confidence: float = 0.99, seed: int = 42) -> bytes:
    """Build a count-min sketch of `col` distributedly; return the
    serialized sketch (the only thing that reaches the driver)."""
    row = df.agg(
        F.expr(
            f"count_min_sketch({col}, {eps}d, {confidence}d, {seed})"
        ).alias("sk")
    ).collect()[0]
    return bytes(row["sk"])


def _load(spark: SparkSession, sketch: bytes):
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytearray(sketch)
    )


def cms_estimate(spark: SparkSession, sketch: bytes,
                 items: Sequence) -> dict:
    """Estimated frequency per item from a serialized sketch."""
    cms = _load(spark, sketch)
    return {it: int(cms.estimateCount(it)) for it in items}


def cms_merge(spark: SparkSession, a: bytes, b: bytes) -> bytes:
    """Counter-wise merge of two same-shaped sketches (exact: the merged
    grid is the elementwise sum)."""
    ja = _load(spark, a)
    jb = _load(spark, b)
    ja.mergeInPlace(jb)
    jvm = spark.sparkContext._jvm
    out = jvm.java.io.ByteArrayOutputStream()
    ja.writeTo(out)
    return bytes(out.toByteArray())
