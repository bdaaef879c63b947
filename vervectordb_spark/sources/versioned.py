"""Versioned parquet tables: snapshot-isolated commits on a plain
filesystem, no table-format dependency.

The reference's only persistence is a pickle blob rewritten in place
(/root/reference/vervectordb/__init__.py:556-573): no versions, no
concurrent-writer story, an interrupt loses the store. `atomic.py` fixes
the torn-write hazard for single-artifact saves; this module supplies the
rest of what a mutable 100 TB store needs — the commit protocol of a table
format (the public Delta/Iceberg design), reduced to its filesystem core:

  data files are immutable     every write lands in a fresh uuid-named
                               directory under data/; nothing is ever
                               modified in place
  a version is a manifest      _manifests/v{N}.json lists exactly the data
                               directories visible at version N (plus op,
                               parent, row count, timestamp)
  commit = publish manifest    the manifest is written to a temp name and
                               published with os.link(tmp, final) — link
                               fails with EEXIST if v{N} already exists, so
                               two racing writers cannot both win a
                               version: one retries against the new head
                               (optimistic concurrency, same contract as a
                               Delta transaction log)
  readers pin a manifest       a read resolves HEAD (or any historical
                               version) once, then only touches that
                               manifest's files — writers never disturb an
                               in-flight read (snapshot isolation), and
                               time travel is just reading an old manifest

Crash safety: an interrupt before the link leaves an orphan data dir and
temp manifest (invisible; removed by vacuum); after the link the commit is
complete. There is no window where a reader sees a torn table.

Scale posture: the protocol costs one small JSON write per commit
regardless of data size; reads plan from a file list exactly like any
parquet scan (pushdown/pruning unchanged). On object stores without
atomic link/rename semantics a real deployment uses a log-backed catalog
service — this is the local-FS/HDFS equivalent, like atomic.py.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class CommitConflict(Exception):
    """Another writer published this version first — reload and retry."""


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFEST_DIR, f"v{version:08d}.json")


class VersionedTable:
    """A directory of immutable parquet data dirs + a manifest log."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(cls, spark: SparkSession, path: str) -> "VersionedTable":
        os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        t = cls(spark, path)
        if t.latest_version() is None:
            t._publish(0, files=[], op="create", parent=None, n_rows=0)
        return t

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "VersionedTable":
        t = cls(spark, path)
        if t.latest_version() is None:
            raise FileNotFoundError(f"no versioned table at {path}")
        return t

    # ------------------------------------------------------------ log
    def latest_version(self) -> int | None:
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        if not os.path.isdir(mdir):
            return None
        versions = [
            int(f[1:9]) for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no versioned table at {self.path}")
        with open(_manifest_path(self.path, v)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        """All manifests, newest first (op, parent, n_rows, ts per entry)."""
        last = self.latest_version()
        if last is None:
            return []
        out = []
        for v in range(last, -1, -1):
            p = _manifest_path(self.path, v)
            if os.path.exists(p):  # tolerate vacuumed gaps
                with open(p) as fh:
                    out.append(json.load(fh))
        return out

    # ------------------------------------------------------------ commit
    def _publish(self, version: int, files: list[str], op: str,
                 parent: int | None, n_rows: int,
                 stats: dict | None = None,
                 meta: dict | None = None) -> dict:
        """Exclusive-publish manifest v{version}. Raises CommitConflict if
        that version already exists (racing writer won). `meta` is
        table-level metadata carried forward commit-to-commit (e.g. the
        rollup's committed-batch-id set) — it lives in the HEAD manifest,
        so it survives vacuum of old versions."""
        man = {
            "version": version,
            "parent": parent,
            "op": op,
            "files": sorted(files),
            "n_rows": n_rows,
            "stats": stats or {},
            "meta": meta or {},
            "ts": time.time(),
        }
        final = _manifest_path(self.path, version)
        tmp = final + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(man, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final)  # atomic, fails with EEXIST on a race
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} of {self.path} was committed by another "
                "writer — re-read HEAD and retry"
            ) from e
        finally:
            os.unlink(tmp)
        return man

    def _write_data(self, df: DataFrame,
                    stats_cols: list[str] | None = None
                    ) -> tuple[str, int, dict]:
        """Write df into a fresh immutable data dir; returns (relpath,
        rows, {col: [min, max]} stats over stats_cols — the Iceberg-style
        manifest entry that lets read_pruned skip the whole dir)."""
        from pyspark.sql import functions as F

        rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
        full = os.path.join(self.path, rel)
        df.write.mode("errorifexists").parquet(full)
        written = self.spark.read.parquet(full)
        aggs = [F.count("*").alias("_n")]
        for c in stats_cols or []:
            aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
        row = written.agg(*aggs).collect()[0]
        stats = {c: [row[f"_lo_{c}"], row[f"_hi_{c}"]]
                 for c in stats_cols or []}
        return rel, row["_n"], stats

    def _commit(self, build, op: str, max_retries: int = 5) -> dict:
        """Publish against the current head, retrying on version races.

        `build(head_manifest) -> (files, n_rows)` derives the new version's
        COMPLETE file list from the head it will be committed against, and
        is re-evaluated on EVERY attempt: a loser that merely bumped the
        version number but kept a file list derived from the stale parent
        would publish a manifest missing the racing winner's files — the
        lost-append race tests/test_versioned.py::
        test_concurrent_appends_all_land caught (40 rows written, 20
        visible)."""
        for _ in range(max_retries):
            head = self.latest_version()
            head_man = self.manifest(head) if head is not None else None
            out = build(head_man)
            files, n_rows, stats = out[:3]
            # 3-tuple builders carry the head's meta forward unchanged
            # (so compaction/overwrite never loses the batch-id set);
            # a 4th element replaces it — re-derived per retry against
            # the FRESH head, same discipline as the file list
            meta = out[3] if len(out) > 3 else (
                dict(head_man.get("meta", {})) if head_man else {})
            try:
                return self._publish(
                    (head if head is not None else -1) + 1,
                    files=files, op=op, parent=head, n_rows=n_rows,
                    stats=stats, meta=meta,
                )
            except CommitConflict:
                continue
        raise CommitConflict(
            f"gave up after {max_retries} retries on {self.path}"
        )

    # ------------------------------------------------------------ writes
    def append(self, df: DataFrame,
               stats_cols: list[str] | None = None,
               op: str = "append", meta_fn=None) -> dict:
        """Add rows: new data dir + manifest carrying parent files + it.
        The data write happens BEFORE the commit race — a loser retries
        with its already-written files, never rewrites data — and the
        parent file list is re-read per attempt (see _commit). With
        stats_cols, the manifest also records the new dir's min/max per
        column (merged with the parent's entries) for read_pruned.
        `op` labels the manifest (default "append"). `meta_fn(head_meta)
        -> meta` updates the carried-forward table metadata — evaluated
        per commit attempt against the fresh head, so writers recording
        e.g. a committed-batch-id set stay race-safe."""
        rel, n, st = self._write_data(df, stats_cols)

        def build(head):
            base = (
                (head["files"] if head else []) + [rel],
                (head["n_rows"] if head else 0) + n,
                {**(head.get("stats", {}) if head else {}), rel: st},
            )
            if meta_fn is None:
                return base
            return (*base,
                    meta_fn(dict(head.get("meta", {})) if head else {}))

        return self._commit(build, op=op)

    def overwrite(self, df: DataFrame,
                  stats_cols: list[str] | None = None) -> dict:
        """Replace the table contents (full copy-on-write: old versions
        remain readable until vacuumed)."""
        rel, n, st = self._write_data(df, stats_cols)
        return self._commit(lambda head: ([rel], n, {rel: st}),
                            op="overwrite")

    def rollback(self, version: int) -> dict:
        """Re-publish an old version's file list as a NEW version (the log
        stays append-only — no history is destroyed)."""
        old = self.manifest(version)
        return self._commit(
            lambda head: (list(old["files"]), old["n_rows"],
                          dict(old.get("stats", {}))),
            op=f"rollback:{version}",
        )

    # ------------------------------------------------------------ reads
    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: resolve a manifest once, scan only its files.
        An empty version yields an empty DataFrame with no schema promise
        (callers that need one pass their own)."""
        man = self.manifest(version)
        if not man["files"]:
            return self.spark.range(0).drop("id")
        paths = [os.path.join(self.path, f) for f in man["files"]]
        return self.spark.read.parquet(*paths)

    def read_pruned(self, predicates: dict, version: int | None = None
                    ) -> DataFrame:
        """Snapshot read that SKIPS data dirs whose manifest stats
        envelope misses any [lo, hi] predicate — file skipping off
        metadata alone, before Spark lists a row (the Iceberg
        manifest-stats design; the per-file variant for a single parquet
        dir is sources/layout.py). Dirs without stats for a predicate
        column are conservatively kept; the residual filter still runs."""
        from pyspark.sql import functions as F

        man = self.manifest(version)
        stats = man.get("stats", {})
        keep = []
        for rel in man["files"]:
            st = stats.get(rel, {})
            ok = True
            for c, (lo, hi) in predicates.items():
                if c in st and st[c][0] is not None:
                    if st[c][1] < lo or st[c][0] > hi:
                        ok = False
                        break
            if ok:
                keep.append(rel)
        if not keep:
            return self.read(version).limit(0).filter(F.lit(False))
        df = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in keep]
        )
        cond = F.lit(True)
        for c, (lo, hi) in predicates.items():
            cond = cond & F.col(c).between(lo, hi)
        return df.filter(cond)

    # ------------------------------------------------------------ maintenance
    def vacuum(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Remove data dirs referenced by NO manifest (crash orphans and
        data dropped by overwrite after its versions were vacuumed) plus
        stale temp manifests. Returns removed relpaths.

        `min_age_seconds` is the safety window every table format needs
        (Delta's VACUUM retention): a CONCURRENT writer that has written
        its data dir but not yet published its manifest is indistinguishable
        from a crash orphan -- deleting it would corrupt the version it is
        about to publish. Only dirs older than the window (mtime) are
        eligible; pass 0 ONLY when no writer can be in flight."""
        import shutil
        import time as _time

        referenced: set[str] = set()
        for man in self.history():
            referenced.update(man["files"])
        removed = []
        now = _time.time()
        ddir = os.path.join(self.path, _DATA_DIR)
        for d in os.listdir(ddir):
            rel = os.path.join(_DATA_DIR, d)
            full = os.path.join(ddir, d)
            if rel in referenced:
                continue
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue  # racing publisher/vacuum -- leave it
            if age < min_age_seconds:
                continue  # possible in-flight writer
            shutil.rmtree(full, ignore_errors=True)
            removed.append(rel)
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        for f in os.listdir(mdir):
            if f.endswith(".tmp"):
                os.unlink(os.path.join(mdir, f))
        return removed

    def expire_versions(self, keep_last: int = 10) -> list[int]:
        """Drop manifests older than the newest `keep_last` (time-travel
        horizon); their exclusively-referenced data falls to vacuum()."""
        last = self.latest_version() or 0
        dropped = []
        for v in range(0, max(0, last - keep_last + 1)):
            p = _manifest_path(self.path, v)
            if os.path.exists(p):
                os.unlink(p)
                dropped.append(v)
        return dropped
