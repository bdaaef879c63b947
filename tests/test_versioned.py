"""Versioned-table commit protocol: snapshot isolation, time travel,
crash/race behavior. (The reference has no versioning to mirror — its
pickle save truncates in place, vervectordb/__init__.py:556-573; this
layer is the mutable-store upgrade SURVEY §2.6/S4 calls for.)"""

import json
import os

import pytest

from vervectordb_spark.sources.versioned import (
    CommitConflict,
    VersionedTable,
    _manifest_path,
)


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedTable.create(spark, str(tmp_path / "t"))


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_create_open_empty(spark, table):
    assert table.latest_version() == 0
    assert table.read().count() == 0
    reopened = VersionedTable.open(spark, table.path)
    assert reopened.manifest()["op"] == "create"
    with pytest.raises(FileNotFoundError):
        VersionedTable.open(spark, table.path + "_nope")


def test_append_accumulates_and_time_travel(spark, table):
    table.append(_df(spark, 0, 10))
    table.append(_df(spark, 10, 15))
    assert table.read().count() == 15
    assert table.read(version=1).count() == 10
    assert table.read(version=0).count() == 0
    assert [m["op"] for m in table.history()] == ["append", "append", "create"]
    assert table.manifest()["n_rows"] == 15


def test_overwrite_is_copy_on_write(spark, table):
    table.append(_df(spark, 0, 10))
    table.overwrite(_df(spark, 100, 103))
    assert table.read().count() == 3
    # the pre-overwrite snapshot still reads — old data untouched
    assert table.read(version=1).count() == 10


def test_rollback_appends_not_rewrites(spark, table):
    table.append(_df(spark, 0, 10))       # v1
    table.overwrite(_df(spark, 0, 2))     # v2
    man = table.rollback(1)               # v3 = v1's files
    assert man["version"] == 3
    assert table.read().count() == 10
    assert table.read(version=2).count() == 2  # history intact


def test_commit_race_loser_retries_with_same_data(spark, table):
    """Simulate a racing writer grabbing the next version: the loser's
    publish hits EEXIST and retries against the new head — its data files
    are written once and survive into the winning commit."""
    table.append(_df(spark, 0, 5))  # v1
    # racer publishes v2 out from under the next append
    racer = table.manifest()
    table._publish(2, files=racer["files"], op="racer",
                   parent=1, n_rows=racer["n_rows"])
    man = table.append(_df(spark, 5, 8))  # wanted v2, must land at v3
    assert man["version"] == 3
    assert man["parent"] == 2
    assert table.read().count() == 8


def test_publish_same_version_twice_conflicts(spark, table):
    with pytest.raises(CommitConflict):
        table._publish(0, files=[], op="dup", parent=None, n_rows=0)


def test_interrupted_commit_invisible_and_vacuumable(spark, table):
    """A writer that dies after writing data but before publishing leaves
    the table exactly as it was; vacuum removes the orphan."""
    table.append(_df(spark, 0, 5))
    rel, _, _ = table._write_data(_df(spark, 5, 50))  # crash before _commit
    assert table.read().count() == 5  # orphan invisible to readers
    # default retention treats the fresh orphan as a possible in-flight
    # writer (Delta-style safety window); explicit 0 reclaims it now
    assert table.vacuum() == []
    removed = table.vacuum(min_age_seconds=0)
    assert rel in removed
    assert not os.path.exists(os.path.join(table.path, rel))
    assert table.read().count() == 5


def test_vacuum_keeps_all_referenced(spark, table):
    table.append(_df(spark, 0, 5))
    table.overwrite(_df(spark, 0, 2))
    assert table.vacuum(min_age_seconds=0) == []  # v1 still referenced
    assert table.read(version=1).count() == 5


def test_expire_then_vacuum_reclaims(spark, table):
    table.append(_df(spark, 0, 5))       # v1
    table.overwrite(_df(spark, 0, 2))    # v2
    dropped = table.expire_versions(keep_last=1)
    assert dropped == [0, 1]
    removed = table.vacuum(min_age_seconds=0)
    assert len(removed) == 1             # v1's now-unreferenced data dir
    assert table.read().count() == 2
    with pytest.raises(FileNotFoundError):
        table.manifest(1)


def test_manifest_is_plain_json(spark, table):
    """The log is engine-agnostic: any process (or DuckDB glob) can read
    the manifest and scan the listed files."""
    table.append(_df(spark, 0, 5))
    with open(_manifest_path(table.path, 1)) as fh:
        man = json.load(fh)
    assert man["files"] and man["op"] == "append"
    import duckdb

    paths = [os.path.join(table.path, f, "*.parquet") for f in man["files"]]
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet({paths!r})"
    ).fetchone()[0]
    assert n == 5


def test_concurrent_appends_all_land(spark, table):
    """Four real threads race appends through the optimistic-commit loop:
    every append must land in SOME version order with no lost rows and a
    contiguous version chain."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(4) as ex:
        list(ex.map(
            lambda i: table.append(_df(spark, i * 10, i * 10 + 10)), range(4)
        ))
    assert table.latest_version() == 4
    assert table.read().count() == 40
    parents = [m["parent"] for m in table.history()]
    assert parents == [3, 2, 1, 0, None]  # linear chain, no forks


def test_manifest_stats_prune_skips_dirs(spark, tmp_path):
    """Iceberg-style data skipping: appends carrying min/max stats let
    read_pruned skip whole data dirs off metadata alone."""
    from pyspark.sql import functions as F

    from vervectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "stats_table"))
    # three appends with disjoint id ranges (e.g. daily ingests)
    for lo in (0, 100, 200):
        df = spark.range(lo, lo + 50).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        )
        t.append(df, stats_cols=["id"])
    man = t.manifest()
    assert len(man["files"]) == 3
    assert all(f in man["stats"] for f in man["files"])

    pruned = t.read_pruned({"id": (110, 130)})
    got = sorted(r["id"] for r in pruned.collect())
    assert got == list(range(110, 131))          # exact result
    n_dirs = (
        pruned.select(F.input_file_name()).distinct().count()
    )
    # only the middle append's files are touched
    full = t.read().select(F.input_file_name()).distinct().count()
    assert n_dirs < full

    # a predicate outside every envelope reads nothing
    assert t.read_pruned({"id": (10_000, 20_000)}).count() == 0

    # rollback keeps the stats usable
    t.append(spark.range(500, 550).select(
        F.col("id"), (F.col("id") % 7).alias("k")), stats_cols=["id"])
    t.rollback(man["version"])
    assert sorted(
        r["id"] for r in t.read_pruned({"id": (110, 130)}).collect()
    ) == list(range(110, 131))


def test_stats_less_appends_stay_readable(spark, tmp_path):
    """Dirs committed WITHOUT stats are conservatively kept by
    read_pruned (no false drops when mixing old and new writers)."""
    from pyspark.sql import functions as F

    from vervectordb_spark.sources.versioned import VersionedTable

    t = VersionedTable.create(spark, str(tmp_path / "mixed_table"))
    t.append(spark.range(0, 10).select("id"))                    # no stats
    t.append(spark.range(100, 110).select("id"), stats_cols=["id"])
    got = sorted(r["id"] for r in t.read_pruned({"id": (0, 5)}).collect())
    assert got == [0, 1, 2, 3, 4, 5]
