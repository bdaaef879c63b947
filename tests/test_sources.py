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
