"""Scale-adaptive scan widening for narrow (unsplittable) inputs.

A parquet file with a single row group yields exactly ONE scan task no
matter how many cores the session has — the fixture layout (one file,
one row group per table) is the `gzip log` case of the optimization
guide §2.5: the first stage of every corpus pipeline ran serially on
1 of 32 local cores (measured: the sf0.1 decontam chain was a single
3.8 s task). `widen_narrow_scan` round-robin-repartitions the frame up
to the session's default parallelism, but ONLY when the frame's current
plan exposes fewer partitions than that — at production layouts (many
files / many row groups) the scan is already at least core-parallel and
the helper is a structural no-op, so no corpus bytes ever cross the
network for it at scale.

Apply it at the root of operators whose per-row work is heavy (Python
kernels, tokenize+explode chains), NOT blanket: a repartition of an
already-wide scan is pure waste, and anything whose OUTPUT geometry
feeds a distributed fit (MLlib k-means) must keep its input partitioning
bit-stable (float reduction order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_narrow_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin split `df` to the session default parallelism iff its
    current plan has fewer partitions. Row-identical (round-robin is
    deterministic under retries via sort-before-repartition); only the
    physical partitioning changes, so any per-row/commutative-aggregate
    consumer is bit-unchanged."""
    sc = df.sparkSession.sparkContext
    tgt = int(target or sc.defaultParallelism)
    if tgt <= 1:
        return df
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning oddity: keep the frame as-is
        return df
    return df.repartition(tgt) if cur < tgt else df
