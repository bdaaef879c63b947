"""Engine-side filesystem probes for streaming state paths.

The streaming handlers keep their dedup state (band/shingle/gram tables,
committed-batch markers) as parquet directories under a `state_path` the
CALLER chooses. On a real deployment that path is HDFS/S3A, not the
driver's local disk — so existence checks and marker creation must go
through the Hadoop FileSystem API (the same resolver `spark.read` uses),
never `os.path`. Driver-local `os.path.exists` on an `hdfs://…` URI
silently returns False: gram/band history would be treated as absent
(span cuts and near-dup rejections against history silently stop) and
committed markers would never short-circuit replays (round-9 advice).

`state_has_data` additionally requires at least one real data file, not
just the directory: a micro-batch whose state frame was empty creates
the directory with only `_SUCCESS`, and a later `spark.read.parquet` on
it dies with schema inference errors — "directory exists" is the wrong
readiness predicate for parquet state.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for `path`, resolved by the path's own scheme
    against the session's Hadoop conf — file://, hdfs://, s3a://, …"""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def state_exists(spark: SparkSession, path: str) -> bool:
    """Directory/file existence through the Hadoop FS resolver."""
    fs, hpath = _fs_and_path(spark, path)
    return bool(fs.exists(hpath))


def state_mkdirs(spark: SparkSession, path: str) -> None:
    """mkdir -p through the Hadoop FS resolver (marker directories)."""
    fs, hpath = _fs_and_path(spark, path)
    fs.mkdirs(hpath)


def state_has_data(spark: SparkSession, path: str) -> bool:
    """True iff `path` exists AND holds at least one non-hidden data
    file (recursively, so partitioned layouts count). `_SUCCESS`,
    `_committed*`, dot-files and empty directories do not qualify —
    reading such a directory as parquet fails schema inference."""
    fs, hpath = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            return True
    return False
