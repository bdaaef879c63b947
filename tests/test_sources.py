"""Source/sink tests: bucketed co-located joins (zero-exchange), raw-corpus
readers landing on canonical schemas."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from vervectordb_spark.plans import audit as A
from vervectordb_spark.schema import load_table
from vervectordb_spark.sources import tables as SRC


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """The payoff of write_bucketed_table: joining two tables bucketed on
    the same key/count plans ZERO exchanges — the 100 TB repeated-join
    strategy (pay the shuffle once at write)."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "label")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    SRC.write_bucketed_table(emb, "b_emb", "vec_id", n_buckets=4)
    SRC.write_bucketed_table(
        docs.withColumnRenamed("doc_id", "vec_id"), "b_docs", "vec_id", n_buckets=4
    )
    joined = spark.table("b_emb").join(spark.table("b_docs"), on="vec_id")
    # disable broadcast so the co-located property (not size) avoids shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = A.physical_plan(joined)
        A.assert_no_shuffle(plan)
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_emb")
        spark.sql("DROP TABLE IF EXISTS b_docs")


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "by_lang")
    SRC.write_vectors_table(docs, path, partition_cols=("lang",))
    back = spark.read.parquet(path).filter(F.col("lang") == "zh")
    plan = A.physical_plan(back)
    assert "PartitionFilters" in plan
    assert back.count() == docs.filter(F.col("lang") == "zh").count()


def test_jsonl_reader(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 0, "text": "hello world", "lang": "en", "source": "s"}\n'
        '{"doc_id": 1, "text": "spark rules"}\n'
    )
    df = SRC.read_documents_jsonl(spark, str(p))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["n_chars"] == 11
    assert rows[1]["n_chars"] == 11 and rows[1]["lang"] is None
    assert [f.name for f in df.schema] == ["doc_id", "text", "lang", "source", "n_chars"]


def test_csv_reader(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text('doc_id,text,lang,source,n_chars\n0,"a,b",en,s,\n1,xyz,de,s,3\n')
    df = SRC.read_documents_csv(spark, str(p))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["text"] == "a,b" and rows[0]["n_chars"] == 3
    assert rows[1]["n_chars"] == 3


def test_text_lines_reader_deterministic(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    # duplicate line included: ids must still be unique and stable
    p.write_text("line one\nline two\n\nline three\nline two\n")
    a = SRC.read_text_lines(spark, str(p)).collect()
    b = SRC.read_text_lines(spark, str(p)).collect()
    assert {(r["doc_id"], r["text"]) for r in a} == {
        (r["doc_id"], r["text"]) for r in b
    }
    assert len(a) == 4  # empty line dropped, duplicate kept
    assert len({r["doc_id"] for r in a}) == 4  # hash ids unique incl. dup line
    # downstream ops run unchanged on the reader output
    from vervectordb_spark.operators.text import profile

    prof = profile(SRC.read_text_lines(spark, str(p)))
    assert prof.count() == 4


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    from vervectordb_spark.sources.tables import read_table, write_table

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "emb_orc")
    write_table(emb, path, format="orc")
    back = read_table(spark, path, format="orc")
    assert back.schema == emb.schema
    assert back.count() == emb.count()
    a = {r.vec_id: r.embedding for r in emb.collect()}
    b = {r.vec_id: r.embedding for r in back.collect()}
    assert a == b


def test_orc_scan_pushes_filters(spark, tmp_path):
    from vervectordb_spark.plans import audit as A
    from vervectordb_spark.sources.tables import read_table, write_table

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_orc")
    write_table(docs, path, format="orc")
    q = read_table(spark, path, format="orc").filter(F.col("lang") == "zh")
    plan = A.physical_plan(q)
    A.assert_pushed_filter(plan, "lang")


def test_register_sql_views_runs_raw_sql(spark):
    from vervectordb_spark.sources.tables import register_sql_views

    register_sql_views(spark, SF_DIR)
    got = spark.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    want = (
        load_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_time_partitioned_layout_prunes_days(spark, tmp_path):
    """A one-day filter over the day-partitioned layout must read ONLY
    that day's directory — runtime scan metrics, not plan text."""
    import glob

    from vervectordb_spark.plans import audit as A
    from vervectordb_spark.schema import load_events
    from vervectordb_spark.sources.tables import (
        read_time_partitioned,
        write_time_partitioned,
    )

    events = load_events(spark, SF_DIR)
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(events, path)
    days_on_disk = len(glob.glob(f"{path}/event_day=*"))
    assert days_on_disk > 5  # the fixture spans ~30 days

    one_day = int(
        events.selectExpr("min(ts div 86400000000000) AS d").collect()[0].d
    )
    q = read_time_partitioned(spark, path).filter(
        F.col("event_day") == one_day
    )
    metrics = A.executed_scan_metrics(q)
    assert metrics["numPartitions"] == 1 < days_on_disk
    # row counts agree with the unpartitioned source
    want = events.filter(
        F.expr("ts div 86400000000000") == one_day
    ).count()
    assert q.count() == want


def test_atomic_save_preserves_old_on_empty_body(tmp_path):
    """A body that writes nothing must leave the live artifact untouched
    (the old flow renamed it away first, stranding it at __old__)."""
    import os

    import pytest as _pytest

    from vervectordb_spark.sources.atomic import atomic_save

    path = str(tmp_path / "art")
    os.makedirs(path)
    open(f"{path}/data.txt", "w").write("v1")
    with _pytest.raises(ValueError, match="no artifact"):
        with atomic_save(path) as tmp:
            pass  # wrote nothing
    assert open(f"{path}/data.txt").read() == "v1"
    assert not os.path.exists(path + ".__old__")


def test_atomic_save_recovers_stranded_old_on_entry(tmp_path):
    """A save that died between its two renames leaves the ONLY copy at
    __old__; the next atomic_save must RESTORE it, never delete it."""
    import os

    from vervectordb_spark.sources.atomic import atomic_save

    path = str(tmp_path / "art2")
    os.makedirs(path + ".__old__")
    open(path + ".__old__/data.txt", "w").write("survivor")
    with atomic_save(path) as tmp:
        os.makedirs(tmp, exist_ok=True)
        open(f"{tmp}/data.txt", "w").write("v2")
    assert open(f"{path}/data.txt").read() == "v2"
    # and if the retry body FAILS, the recovered artifact must survive
    os.makedirs(path + ".__old__", exist_ok=True)  # simulate again
    open(path + ".__old__/data.txt", "w").write("survivor2")
    import shutil

    shutil.rmtree(path)
    try:
        with atomic_save(path) as tmp:
            raise RuntimeError("writer died")
    except RuntimeError:
        pass
    assert open(f"{path}/data.txt").read() == "survivor2"


def test_pruned_scan_reads_post_stats_appends(spark, tmp_path):
    """Files appended AFTER collect_file_stats have no stats entry — they
    must be scanned unpruned, not silently dropped."""
    from vervectordb_spark.sources.layout import pruned_scan, write_zordered

    path = str(tmp_path / "z")
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    write_zordered(df, path, ["a", "b"], n_files=4)
    extra = spark.createDataFrame([(1000, 2000)], "a long, b long")
    extra.coalesce(1).write.mode("append").parquet(path)
    got = pruned_scan(spark, path, {"a": (900, 1100)}).collect()
    assert len(got) == 1 and got[0]["a"] == 1000


def test_zorder_empty_input_clear_error(spark, tmp_path):
    import pytest as _pytest

    from vervectordb_spark.sources.layout import write_zordered

    empty = spark.range(0).select(F.col("id").alias("a"))
    with _pytest.raises(ValueError, match="ranges"):
        write_zordered(empty, str(tmp_path / "ze"), ["a"])


def test_time_partition_floor_division_pre_epoch(spark, tmp_path):
    """Pre-epoch timestamps must land in day -1, not get merged into day
    0 by truncating division."""
    import glob

    from vervectordb_spark.sources.tables import write_time_partitioned

    ns_day = 24 * 3_600_000_000_000
    df = spark.createDataFrame(
        [(-1,), (0,), (ns_day - 1,), (ns_day,)], "ts long"
    )
    path = str(tmp_path / "days")
    write_time_partitioned(df, path)
    days = sorted(
        int(d.rsplit("=", 1)[1])
        for d in glob.glob(f"{path}/event_day=*")
    )
    assert days == [-1, 0, 1]


def test_write_training_shards_roundtrip(spark, tmp_path):
    """Deterministic shard membership, one file per shard dir, manifest
    counts match the data, and a re-export lands every row in the SAME
    shard."""
    import glob
    import json

    from vervectordb_spark.schema import load_table
    from vervectordb_spark.sources.tables import write_training_shards

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "shards")
    man = {r["shard"]: r["n_rows"]
           for r in write_training_shards(docs, path, rows_per_shard=64,
                                          id_col="doc_id").collect()}
    assert sum(man.values()) == 500
    assert len(man) == 8  # ceil(500/64)
    meta = json.load(open(f"{path}/_shards_manifest.json"))
    assert meta["total_rows"] == 500 and meta["n_shards"] == 8
    assert {int(k): v for k, v in meta["shards"].items()} == man
    for shard in man:
        files = glob.glob(f"{path}/shard={shard}/part-*")
        assert len(files) == 1, shard
    back = spark.read.parquet(path)
    assert back.count() == 500
    first = {r["doc_id"]: r["shard"] for r in back.select("doc_id", "shard").collect()}
    path2 = str(tmp_path / "shards2")
    write_training_shards(docs, path2, rows_per_shard=64, id_col="doc_id")
    second = {r["doc_id"]: r["shard"]
              for r in spark.read.parquet(path2).select("doc_id", "shard").collect()}
    assert first == second


def test_write_training_shards_rejects_bad_input(spark):
    import pytest as _pytest

    from vervectordb_spark.sources.tables import write_training_shards

    df = spark.createDataFrame([], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="empty"):
        write_training_shards(df, "/tmp/never", 10, id_col="doc_id")
    df2 = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="positive"):
        write_training_shards(df2, "/tmp/never", 0, id_col="doc_id")
