"""Z-order clustering + per-file column-stats data skipping.

At 100 TB, the scan you never run is the fastest one. Partition pruning
(sources/tables.py day layout, the IVF cluster layout) covers ONE
dimension; multi-dimensional selective scans need the other two public
table-format tricks (the Delta `OPTIMIZE ZORDER BY` / Iceberg sort-order +
manifest-stats design):

  Z-order clustering     interleave the bits of k range-bucketed columns
                         into one Morton code and range-partition + sort
                         files by it — rows close in ANY of the k
                         dimensions land in few files, so per-file min/max
                         envelopes stay tight in every dimension at once
                         (a single-column sort gives tight envelopes in
                         that column only).
  per-file stats         one post-write scan records each file's min/max
                         per indexed column into a stats JSON (the
                         filesystem reduction of a Delta transaction-log
                         stats entry / Iceberg manifest).
  stats-pruned scan      a range predicate reads ONLY the files whose
                         [min, max] envelope intersects it — file skipping
                         before Spark even lists a row. Pruning is safe by
                         construction (an envelope that doesn't intersect
                         cannot contain a matching row); the residual
                         filter still runs on the survivors.

The reference has no layout story at all (one pickle blob,
/root/reference/vervectordb/__init__.py:556-573). Everything here is
plain parquet + JSON on any filesystem.

All expressions are JVM-side column arithmetic (width_bucket + bit
interleave via shiftleft/bitwiseOR chains — codegen, no UDF).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_FILE = "_zorder_stats.json"


def bucket_expr(col: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) integer buckets by linear
    range (width_bucket is 1-based; values at/under lo -> 0, at/over hi
    -> 2^bits - 1)."""
    c = F.col(col) if isinstance(col, str) else col
    n = 1 << bits
    b = F.width_bucket(c.cast("double"), F.lit(float(lo)), F.lit(float(hi)),
                       F.lit(n)) - F.lit(1)
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), b)).cast("long")


def interleave_expr(buckets: Sequence[Column], bits: int) -> Column:
    """Morton code: bit i of column j lands at position i * k + j. A
    fixed shiftleft/bitwiseOR chain — ~bits·k ops, whole-stage codegen."""
    k = len(buckets)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zorder_expr(df: DataFrame, cols: Sequence[str], bits: int = 8,
                ranges: dict[str, tuple[float, float]] | None = None,
                ) -> Column:
    """Z-value over `cols`. Bucket ranges default to each column's
    observed min/max (ONE small agg job); pass `ranges` to pin them."""
    if ranges is None:
        row = df.agg(*[f(c) for c in cols
                       for f in (F.min, F.max)]).collect()[0]
        if any(row[i] is None for i in range(2 * len(cols))):
            bad = [c for i, c in enumerate(cols) if row[2 * i] is None]
            raise ValueError(
                f"cannot derive z-order ranges: columns {bad} have no "
                "non-null values (empty input?); pass explicit ranges="
            )
        ranges = {c: (float(row[2 * i]), float(row[2 * i + 1]))
                  for i, c in enumerate(cols)}
    buckets = [bucket_expr(c, *ranges[c], bits) for c in cols]
    return interleave_expr(buckets, bits)


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   n_files: int = 16, bits: int = 8) -> None:
    """Write `df` as parquet clustered by the z-value of `cols` (range
    partition into ~n_files files, sorted within each), then record
    per-file min/max stats for `cols`. Two jobs: the clustered write and
    one stats scan of what was written — the scan is the filesystem
    stand-in for stats a table format collects during the write."""
    z = zorder_expr(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite").parquet(path)
    )
    collect_file_stats(df.sparkSession, path, cols)


def collect_file_stats(spark: SparkSession, path: str,
                       cols: Sequence[str]) -> list[dict]:
    """Record per-file min/max for `cols` into {path}/_zorder_stats.json.
    One distributed scan grouped by file name; the stats table itself is
    #files rows — metadata-sized at any data scale."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    rows = (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
        .collect()
    )
    stats = [r.asDict() for r in rows]
    with open(os.path.join(path, STATS_FILE), "w") as f:
        json.dump({"cols": list(cols), "files": stats}, f)
    return stats


def _basename(p: str) -> str:
    # stats record fully-qualified file: URIs; globs give local paths
    return p.rsplit("/", 1)[-1]


def pruned_scan(spark: SparkSession, path: str,
                predicates: dict[str, tuple]) -> DataFrame:
    """Scan `path` reading ONLY files whose stats envelope intersects
    every [lo, hi] predicate (any orderable type — numbers, id strings),
    then apply the residual filter. Safe by construction: a file whose
    [min_c, max_c] misses [lo, hi] cannot hold a matching row. Columns
    without stats are ignored for skipping (their predicate still filters
    rows). The file list decision is driver-side over #files stats
    entries — metadata, not data.

    Kept files are resolved RELATIVE to `path` (by basename): the stats
    JSON records fully-qualified URIs of wherever the files lived when
    collected, which goes stale under the atomic rename-swap every save
    path here uses (write to `.__tmp__`, swap in)."""
    with open(os.path.join(path, STATS_FILE)) as f:
        meta = json.load(f)
    keep = []
    for s in meta["files"]:
        ok = True
        for c, (lo, hi) in predicates.items():
            if f"min_{c}" in s and s[f"min_{c}"] is not None:
                if s[f"max_{c}"] < lo or s[f"min_{c}"] > hi:
                    ok = False
                    break
        if ok:
            keep.append(os.path.join(path, _basename(s["file"])))
    # files written AFTER collect_file_stats (a plain append) have no
    # stats entry — they must be scanned unpruned, not silently dropped
    # (skipping is only safe for files whose envelope PROVES a miss)
    known = {_basename(s["file"]) for s in meta["files"]}
    import glob as _glob

    for f in _glob.glob(os.path.join(path, "*.parquet")):
        if _basename(f) not in known:
            keep.append(f)
    if not keep:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*keep)
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = cond & F.col(c).between(lo, hi)
    return df.filter(cond)
