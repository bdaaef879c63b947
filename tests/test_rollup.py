"""Incremental materialized rollup (operators/rollup.py): the algebraic
invariant (merge of any partition of the data == direct aggregate),
split-shape independence, HLL sketch-merge determinism, and the
persisted ContinuousRollup lifecycle (refresh appends, compact preserves
results, pinned snapshots survive compaction)."""

import pytest

from pyspark.sql import functions as F

from vervectordb_spark.operators import rollup
from vervectordb_spark.schema import load_events

SF_DIR = "/root/testdata/sf0.001"
KEYS = ["hour_bucket", "event_type"]


@pytest.fixture(scope="module")
def ev(spark):
    return (
        load_events(spark, SF_DIR)
        .withColumn("hour_bucket", F.expr("ts div 3600000000000"))
        .cache()
    )


def _direct(ev):
    return rollup.partial_rollup(ev, KEYS, "value", distinct_col="user_id")


def _final_rows(df):
    return {
        (r["hour_bucket"], r["event_type"]): (
            r["n"], str(r["sum_v"]), str(r["min_v"]), str(r["max_v"]),
            r.asDict().get("n_distinct_est"),
        )
        for r in rollup.finalize_rollup(df).collect()
    }


def test_merge_of_split_equals_direct(ev):
    """3-way split by event_id % 3 -> partials -> merge == one direct
    aggregate, exactly — counts, DECIMAL sums, min/max, and even the HLL
    estimates (same rows into the same sketches => identical sketches)."""
    parts = [
        rollup.partial_rollup(ev.filter(F.col("event_id") % 3 == i), KEYS,
                              "value", distinct_col="user_id")
        for i in range(3)
    ]
    merged = rollup.merge_rollup(
        parts[0].unionByName(parts[1]).unionByName(parts[2]), KEYS
    )
    assert _final_rows(merged) == _final_rows(_direct(ev))


def test_split_shape_independence(ev):
    """2-way and 5-way splits merge to the same state — the refresh
    cadence can never change the answer."""
    def split_merge(k):
        parts = [
            rollup.partial_rollup(ev.filter(F.col("event_id") % k == i),
                                  KEYS, "value", distinct_col="user_id")
            for i in range(k)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return rollup.merge_rollup(u, KEYS)

    assert _final_rows(split_merge(2)) == _final_rows(split_merge(5))


def test_merge_is_reentrant(ev):
    """merge(merge(x)) == merge(x): compaction is just a merge, so
    compacting twice (or merging already-merged state with new partials)
    is sound."""
    p = _direct(ev)
    once = rollup.merge_rollup(p, KEYS)
    twice = rollup.merge_rollup(once, KEYS)
    assert _final_rows(once) == _final_rows(twice)


def test_continuous_rollup_lifecycle(spark, ev, tmp_path):
    cr = rollup.ContinuousRollup(spark, str(tmp_path / "agg"), KEYS,
                                 "value", distinct_col="user_id")
    for i in range(3):
        cr.refresh(ev.filter(F.col("event_id") % 3 == i))
    expect = _final_rows(_direct(ev))
    assert _final_rows(merge := rollup.merge_rollup(cr.partials(), KEYS)) == expect  # noqa: F841
    got = {
        (r["hour_bucket"], r["event_type"]): r["n"]
        for r in cr.read().collect()
    }
    assert got == {k: v[0] for k, v in expect.items()}

    # partials currently hold 3 rows per group (one per refresh)
    n_groups = cr.read().count()
    assert cr.partials().count() > n_groups

    pinned_version = cr.table.latest_version()
    cr.compact()
    # compaction: one partial row per group, identical read() results
    assert cr.partials().count() == n_groups
    assert _final_rows(rollup.merge_rollup(cr.partials(), KEYS)) == expect
    # the pre-compaction snapshot is still readable (copy-on-write)
    assert cr.table.read(pinned_version).count() > n_groups


def test_refresh_then_read_reflects_new_batch(spark, ev, tmp_path):
    cr = rollup.ContinuousRollup(spark, str(tmp_path / "agg2"), KEYS,
                                 "value")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    cr.refresh(half1)
    n1 = cr.read().agg(F.sum("n")).first()[0]
    assert n1 == half1.count()
    cr.refresh(ev.filter(F.col("event_id") % 2 == 1))
    n2 = cr.read().agg(F.sum("n")).first()[0]
    assert n2 == ev.count()


def test_streaming_refresh_matches_batch_and_is_idempotent(spark, ev, tmp_path):
    """foreachBatch maintenance: streamed micro-batches fold to the same
    state as one batch aggregate; a re-delivered batch_id is a no-op
    (the transactional-sink handshake), so retries never double-count."""
    src = str(tmp_path / "src")
    cols = ["event_id", "hour_bucket", "event_type", "user_id", "value"]
    ev.select(*cols).write.parquet(src)
    cr = rollup.ContinuousRollup(spark, str(tmp_path / "agg3"), KEYS,
                                 "value", distinct_col="user_id")
    stream = spark.readStream.schema(
        "event_id long, hour_bucket long, event_type string, "
        "user_id long, value double"
    ).parquet(src)
    q = cr.streaming_refresh(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert _final_rows(rollup.merge_rollup(cr.partials(), KEYS)) \
        == _final_rows(_direct(ev))
    # re-deliver an already-committed batch id -> no new version
    v = cr.table.latest_version()
    cr.refresh(ev.select(*cols), batch_id=0)
    assert cr.table.latest_version() == v
    # a NEW batch id still commits
    cr.refresh(ev.select(*cols).limit(10), batch_id=999)
    assert cr.table.latest_version() == v + 1


def test_batch_id_set_survives_expire_and_compact(spark, ev, tmp_path):
    """ADVICE r5: the committed-batch-id set lives in the HEAD manifest's
    carried-forward meta — O(1) to check, and a late re-delivery of a
    batch whose own manifest was expired/vacuumed still skips instead of
    double-counting. Compaction (overwrite) carries the set too."""
    cols = ["event_id", "hour_bucket", "event_type", "user_id", "value"]
    cr = rollup.ContinuousRollup(spark, str(tmp_path / "agg4"), KEYS,
                                 "value", distinct_col="user_id")
    for bid in range(4):
        cr.refresh(ev.select(*cols).filter(F.col("event_id") % 4 == bid),
                   batch_id=bid)
    assert cr.committed_batches() == {0, 1, 2, 3}
    expect = _final_rows(_direct(ev))
    assert _final_rows(rollup.merge_rollup(cr.partials(), KEYS)) == expect

    # expire every manifest but HEAD, vacuum the orphaned data
    cr.table.expire_versions(keep_last=1)
    cr.table.vacuum(min_age_seconds=0)
    # batch 0's own manifest is gone — the head meta still remembers it
    v = cr.table.latest_version()
    cr.refresh(ev.select(*cols).filter(F.col("event_id") % 4 == 0),
               batch_id=0)
    assert cr.table.latest_version() == v  # skipped, not double-counted
    assert _final_rows(rollup.merge_rollup(cr.partials(), KEYS)) == expect

    # compaction is an overwrite — the set must survive it
    cr.compact()
    assert cr.committed_batches() == {0, 1, 2, 3}
    v = cr.table.latest_version()
    cr.refresh(ev.select(*cols), batch_id=2)
    assert cr.table.latest_version() == v
    # a genuinely new batch still commits and joins the set
    cr.refresh(ev.select(*cols).limit(5), batch_id=7)
    assert cr.committed_batches() == {0, 1, 2, 3, 7}
