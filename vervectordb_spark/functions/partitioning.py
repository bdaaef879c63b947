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


def _plan_partitions(df: DataFrame) -> int:
    """Partition count of `df`'s physical plan, memoized per (session,
    input-file-set): df.rdd.getNumPartitions() converts the whole plan to
    an RDD DAG on the DRIVER — paying that on every operator call is the
    same py4j-cost class the r11 SQL-string work removed (VERDICT r11
    item 6). Call sites apply the widener to scan-rooted frames, whose
    partition count is a function of the scanned files + session confs
    alone, so the second and later probes of the same file set answer
    from the cache (one inputFiles() plan walk instead of full physical
    planning). Non-file-rooted frames (empty inputFiles) skip the cache."""
    spark = df.sparkSession
    files: tuple[str, ...] = ()
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:  # noqa: BLE001 — plan without a file index
        pass
    if not files:
        return df.rdd.getNumPartitions()
    cache: dict = spark.__dict__.setdefault("_vv_scan_partitions", {})
    got = cache.get(files)
    if got is None:
        got = cache[files] = df.rdd.getNumPartitions()
    return got


def widen_narrow_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin split `df` to the session default parallelism iff its
    current plan is ESSENTIALLY SERIAL (one partition). Row-identical
    (round-robin is deterministic under retries via
    sort-before-repartition); only the physical partitioning changes, so
    any per-row/commutative-aggregate consumer is bit-unchanged.

    r12: the trigger tightened from `cur < parallelism` to `cur == 1`.
    A PARTIALLY parallel scan (the 16-file sf1 fixture on 32 cores) does
    not serialize the map stage — it halves it — while the inserted
    exchange moves the full payload and, worse, RE-EXECUTES once per
    consumer of the widened subtree (Catalyst does not reuse it; see
    OPTIMIZATION_r12.md). Measured at sf1 c32: bigram 6.54 -> 2.12 s,
    trigram 6.04 -> 4.22 s, kn5 11.34 -> 8.50 s without the 16->32
    split. The cur == 1 case (single-file/single-row-group fixtures,
    gzip logs) keeps every r11/r12-verified win; real layouts are
    many-partition and remain a structural no-op."""
    sc = df.sparkSession.sparkContext
    tgt = int(target or sc.defaultParallelism)
    if tgt <= 1:
        return df
    try:
        cur = _plan_partitions(df)
    except Exception:  # noqa: BLE001 — planning oddity: keep the frame as-is
        return df
    return df.repartition(tgt) if cur == 1 else df
