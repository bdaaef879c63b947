#!/usr/bin/env python
"""Freeze the IMI probe calibration as a committed artifact
(models/imi_probe_calib) — the models/tiny_ulm vendoring pattern, so
imi_search_calibrated graduates from rows-only to hash-gated (VERDICT
r10 task #5).

Builds the EXACT index the gated query builds (frozen half-centroids =
first 8 fixture embeddings split at dim 32) on the sf0.01 fixture and
records calibrate_probe(sample_size=512, seed=42)'s per-half
rank-coverage CDFs. Reproducibility is pytest-pinned
(tests/test_imi.py::test_calibration_artifact_reproducible)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from vervectordb_spark.operators.imi import (
        IMIIndex, default_calibration_dir, save_probe_calibration)
    from vervectordb_spark.schema import load_table
    from vervectordb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("freeze-imi-calib")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 8)
    cent1 = base.select(
        F.col("vec_id").cast("int").alias("cell_id"),
        F.slice(F.col("embedding").cast("array<double>"), 1, 32)
        .alias("centroid"))
    cent2 = base.select(
        F.col("vec_id").cast("int").alias("cell_id"),
        F.slice(F.col("embedding").cast("array<double>"), 33, 32)
        .alias("centroid"))
    idx = IMIIndex.from_centroids(emb, cent1, cent2, dim=64)
    cdfs = idx.calibrate_probe(sample_size=512, seed=42)
    out = default_calibration_dir()
    save_probe_calibration(cdfs, out)
    print(f"wrote {out}: F1={list(cdfs[0])} F2={list(cdfs[1])}")


if __name__ == "__main__":
    main()
