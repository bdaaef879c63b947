"""Persistent BUCKETED gram-history state for incremental span dedup.

SCALE.md finding #12 measured the incremental ExactSubstr increment as
affine — |new| gram work plus a ~constant that is almost entirely the
per-batch reshuffle of the corpus-sized history key table into the
dup-key join. That constant is removable: persist the history CLUSTERED
(bucketed) on the gram key, and the join's history side arrives already
hash-partitioned — Spark shuffles only the batch positions (to the
bucket count), never the state.

Layout: an EXTERNAL parquet table `CLUSTERED BY (gram_h, gram_h2) INTO n
BUCKETS`, re-registered into any session's catalog by DDL over the same
directory (bucketing metadata lives in the catalog, so a bare
`spark.read.parquet` would lose it — always go through `read()`).
Updates write the merged history as a NEW versioned table directory and
swap a tiny meta.json pointer (write-then-swap, same crash posture as
sources/atomic): a reader never observes a half-written version, and the
merge aggregation `groupBy(gram key)` itself runs shuffle-free on the
history side because the old table's clustering already satisfies the
grouping distribution.

PATH CONTRACT: driver-local or shared-POSIX state paths ONLY (NFS is
fine; hdfs:// and s3a:// are NOT). The parquet data itself would land
remote via the table LOCATION, but meta.json, the pointer swap, and
old-version cleanup use driver-local os/open/os.replace/shutil.rmtree —
on a remote scheme the pointer would silently live on one driver's
local disk (load() from another driver fails, old versions leak).
create()/load() raise on remote schemes instead of corrupting state; a
remote deployment should keep this state on a shared POSIX mount or use
the streaming handler below, whose probes already go through the Hadoop
FileSystem API (sources/fs.py).

This is the batch-pipeline state manager (the
incremental_remove_duplicate_spans caller's shape). The STREAMING
handler (streaming/ingest.make_spancut_handler) keeps its
partition-per-batch layout on purpose — its retry idempotence depends on
dynamic partition overwrite plus own-batch exclusion, which a merged
table cannot express.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from vervectordb_spark.operators.spans import GRAM_KEY

_SCHEMA_DDL = "gram_h BIGINT, gram_h2 BIGINT, n_occurrences BIGINT"



def _require_local_path(path: str) -> None:
    """Module path contract (see header): POSIX paths only — loud error
    beats a meta.json pointer silently written to the wrong filesystem."""
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme and scheme != "file":
        raise NotImplementedError(
            f"GramHistoryState supports driver-local/shared-POSIX state "
            f"paths only, got scheme '{scheme}://'. Use a shared POSIX "
            f"mount, or the streaming span-cut handler "
            f"(streaming/ingest.make_spancut_handler) whose state IO "
            f"goes through the Hadoop FileSystem API.")


class GramHistoryState:
    """Versioned bucketed gram-history table under a state directory."""

    def __init__(self, spark: SparkSession, path: str, name: str,
                 n_buckets: int, version: int):
        self.spark = spark
        self.path = path
        self.name = name
        self.n_buckets = n_buckets
        self.version = version

    # -- naming ----------------------------------------------------------
    @property
    def table(self) -> str:
        return f"{self.name}_v{self.version}"

    def _dir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")

    # -- lifecycle -------------------------------------------------------
    @classmethod
    def create(cls, spark: SparkSession, path: str, grams: DataFrame,
               name: str | None = None, n_buckets: int = 64,
               ) -> "GramHistoryState":
        """Initialize the state from a gram_history-shaped frame."""
        _require_local_path(path)
        if name is None:
            # catalog identifiers must be unique per state dir
            import hashlib

            name = "gram_hist_" + hashlib.md5(
                os.path.abspath(path).encode()).hexdigest()[:12]
        os.makedirs(path, exist_ok=True)
        st = cls(spark, path, name, int(n_buckets), 0)
        st._write_version(grams, 0)
        st._commit_meta(0)
        return st

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "GramHistoryState":
        """Re-open existing state (any session): reads meta.json and
        re-registers the current version's external bucketed table."""
        _require_local_path(path)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        st = cls(spark, path, meta["name"], int(meta["n_buckets"]),
                 int(meta["version"]))
        st._register(st.version)
        return st

    # -- internals -------------------------------------------------------
    def _register(self, version: int) -> None:
        table = f"{self.name}_v{version}"
        loc = os.path.abspath(self._dir(version))
        self.spark.sql(f"""
            CREATE TABLE IF NOT EXISTS {table} ({_SCHEMA_DDL})
            USING parquet
            CLUSTERED BY (gram_h, gram_h2)
            SORTED BY (gram_h, gram_h2) INTO {self.n_buckets} BUCKETS
            LOCATION '{loc}'
        """)

    def _write_version(self, grams: DataFrame, version: int) -> None:
        table = f"{self.name}_v{version}"
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        (grams.select(*GRAM_KEY, "n_occurrences")
         .write.format("parquet")
         .bucketBy(self.n_buckets, *GRAM_KEY)
         .sortBy(*GRAM_KEY)
         .option("path", os.path.abspath(self._dir(version)))
         .mode("overwrite")
         .saveAsTable(table))

    def _commit_meta(self, version: int) -> None:
        tmp = os.path.join(self.path, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"name": self.name, "n_buckets": self.n_buckets,
                       "version": version}, f)
        os.replace(tmp, os.path.join(self.path, "meta.json"))
        self.version = version

    # -- API -------------------------------------------------------------
    def read(self) -> DataFrame:
        """The current history as a DataFrame whose scan carries the
        bucketed output partitioning (co-located gram-key joins)."""
        self._register(self.version)
        return self.spark.table(self.table)

    def update(self, batch_grams: DataFrame) -> "GramHistoryState":
        """Merge a batch's gram_history-shaped frame into the state:
        version k+1 = v_k FULL OUTER JOIN batch-aggregate on the gram
        key with summed counts, then swap the meta pointer and drop v_k.
        The join (not a union+groupBy, which would erase the scan's
        partitioning info) lets the clustered v_k side satisfy the join
        distribution as-is — only the batch side shuffles, to the bucket
        count."""
        from pyspark.sql import functions as F

        new_v = self.version + 1
        batch_agg = (batch_grams.groupBy(*GRAM_KEY)
                     .agg(F.sum("n_occurrences").alias("_b")))
        merged = (self.read().withColumnRenamed("n_occurrences", "_h")
                  .join(batch_agg, on=GRAM_KEY, how="full_outer")
                  .select(*GRAM_KEY,
                          (F.coalesce(F.col("_h"), F.lit(0))
                           + F.coalesce(F.col("_b"), F.lit(0)))
                          .cast("bigint").alias("n_occurrences")))
        self._write_version(merged, new_v)
        old_table, old_dir = self.table, self._dir(self.version)
        self._commit_meta(new_v)
        self.spark.sql(f"DROP TABLE IF EXISTS {old_table}")
        shutil.rmtree(old_dir, ignore_errors=True)
        return self
