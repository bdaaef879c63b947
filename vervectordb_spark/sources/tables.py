"""Source/sink layer: table layouts and raw-format readers.

The reference's only storage is one pickle blob (S4/S5,
vervectordb/__init__.py:556-594). Here storage IS the scale strategy:

  write_vectors_table    plain partitioned parquet (the default sink; the
                         IVF layout partitionBy(cluster_id) lives in
                         operators/ivf.save)
  write_bucketed_table   catalog table bucketed by the join key — two
                         tables bucketed the same way join WITHOUT any
                         exchange (co-located join). This is the 100 TB
                         answer for repeated fact-fact joins: pay the
                         shuffle once at write, never at read.
  read_documents_jsonl / read_documents_csv / read_text_lines
                         raw-corpus ingest into the documents schema (the
                         reference's data/datawhale.txt is a bare text
                         file; these are its production-shaped readers)

All readers land on the same canonical schemas so every downstream
operator (dedup, text profile, embed, search) runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


def write_vectors_table(df: DataFrame, path: str,
                        partition_cols: tuple[str, ...] = (),
                        mode: str = "overwrite") -> None:
    """Partitioned parquet sink. Choose partition columns with bounded
    cardinality (cluster_id, lang, date) — predicates on them become
    directory pruning."""
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def write_bucketed_table(df: DataFrame, table: str, bucket_col: str,
                         n_buckets: int = 32,
                         sort_col: str | None = None,
                         mode: str = "overwrite") -> None:
    """Catalog-managed bucketed table: rows are hash-distributed into
    n_buckets files by `bucket_col` AT WRITE TIME. A join of two tables
    bucketed on the same key with the same bucket count runs with ZERO
    exchanges (verified in tests/test_sources.py) — the shuffle is paid
    once here instead of on every query."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


# ---------------------------------------------------------------------------
# raw-corpus readers
# ---------------------------------------------------------------------------


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL corpus → documents schema. Missing fields null-filled;
    n_chars derived when absent."""
    df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    return df.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )


def read_documents_csv(spark: SparkSession, path: str,
                       header: bool = True) -> DataFrame:
    df = (
        spark.read.option("header", header)
        .option("multiLine", True)
        .option("escape", '"')
        .schema(DOCUMENTS_SCHEMA)
        .csv(path)
    )
    return df.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("long")),
    )


def read_text_lines(spark: SparkSession, path: str,
                    source: str = "textfile") -> DataFrame:
    """Bare text file(s), one document per line — the exact shape of the
    reference's data/datawhale.txt corpus.

    doc_id must be deterministic across runs AND partitionings
    (monotonically_increasing_id is neither), and must not cost a
    global-order window (row_number over the whole corpus funnels 100 TB
    through ONE partition). So: doc_id = md5-60-bit of (file, occurrence,
    text). Duplicate lines within a file are disambiguated by an
    occurrence index from a window partitioned by (file, text) — its
    partitions are the duplicate groups themselves, bounded and tiny."""
    from pyspark.sql import Window

    from vervectordb_spark.functions.hashing import md5_long

    lines = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("source_file"),
    )
    w = Window.partitionBy("source_file", "text").orderBy(F.lit(1))
    return (
        lines.filter(F.length("text") > 0)
        .withColumn("_occ", F.row_number().over(w))
        .withColumn(
            "doc_id",
            md5_long(F.concat_ws("\u0000", "source_file", "_occ", "text")),
        )
        .select(
            "doc_id",
            "text",
            F.lit(None).cast("string").alias("lang"),
            F.lit(source).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# generic multi-format sink / source (parquet, orc, json, csv)
# ---------------------------------------------------------------------------

_FORMATS = ("parquet", "orc", "json", "csv")


def write_table(df: DataFrame, path: str, format: str = "parquet",
                partition_cols: tuple[str, ...] = (),
                mode: str = "overwrite") -> None:
    """Format-agnostic sink. parquet and orc are the columnar production
    formats (both vectorized, both carry schema + min/max stats so filter
    pushdown and pruning survive the format swap); json/csv are interchange
    sinks (row-oriented, no stats — documented as export-only, not the
    100 TB layout)."""
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    w = df.write.mode(mode)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    if format == "csv":
        w = w.option("header", "true")
    w.format(format).save(path)


def read_table(spark: SparkSession, path: str, format: str = "parquet",
               schema: T.StructType | None = None) -> DataFrame:
    """Format-agnostic reader. For json/csv pass an explicit schema —
    inference is a full extra pass over the data (a complete 100 TB scan
    spent guessing types) and type-lossy for csv."""
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if format == "csv":
        r = r.option("header", "true")
    return r.format(format).load(path)


def register_sql_views(spark: SparkSession, sf_dir: str,
                       tables: tuple[str, ...] = (
                           "region", "nation", "customer", "supplier",
                           "part", "orders", "lineitem", "events",
                           "documents", "embeddings",
                       )) -> None:
    """Register every fixture table as a temp view so the whole engine is
    reachable from `spark.sql(...)` — the SQL twin of the DataFrame API
    (same Catalyst plans, same pushdown). The DuckDB oracle strings in the
    query registry are near-portable to this surface."""
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# time-partitioned event layout — directory pruning for time-range scans
# ---------------------------------------------------------------------------

def write_time_partitioned(events: DataFrame, path: str,
                           ts_col: str = "ts",
                           mode: str = "overwrite") -> None:
    """Persist events partitioned by event day (epoch-ns `ts` → integer
    day bucket) — the time-series twin of the IVF cluster layout: a
    time-range predicate on `event_day` prunes whole directories at plan
    time, so a one-day query over a year of data reads 1/365th of the
    files. Day is FLOOR division of epoch-ns (the same epoch-ns contract
    as schema.load_events): `div` truncates toward zero, which would
    merge the last pre-epoch partial day into day 0; floor keeps every
    bucket a true calendar day. Column expression, not an f-string SQL
    fragment, so quoted/odd column names work."""
    ns_per_day = 24 * 3_600_000_000_000
    # exact int64 floor division: `div` truncates toward zero, so shift
    # the quotient down by one when the remainder is negative (a double
    # round-trip would lose low bits at epoch-ns magnitudes > 2^53)
    q = F.expr(f"`{ts_col}` div {ns_per_day}")
    r = F.expr(f"`{ts_col}` % {ns_per_day}")
    with_day = events.withColumn(
        "event_day", F.when(r < 0, q - 1).otherwise(q).cast("long")
    )
    with_day.write.mode(mode).partitionBy("event_day").parquet(path)


def read_time_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read the day-partitioned layout; filter on `event_day` for
    directory pruning (verified by runtime scan metrics in
    tests/test_sources.py)."""
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# sharded training export
# ---------------------------------------------------------------------------


def write_training_shards(df: DataFrame, path: str, rows_per_shard: int,
                          id_col: str, format: str = "parquet",
                          seed: int = 42,
                          n_shards: int | None = None) -> DataFrame:
    """Export a curated corpus as numbered training shards — the sink a
    packing/curation pipeline hands to a trainer's dataloader.

    Shard membership is pmod(md5(id), n_shards) (the house draw family):
    stable across runs, engines, and partitionings FOR A FIXED n_shards.
    By default n_shards = ceil(n / rows_per_shard) — derived from the
    CURRENT count, so an incremental re-export whose count crosses a
    shard boundary changes the modulus and reshuffles memberships; pass
    an explicit n_shards to pin the modulus when trainer-side shard
    caching/resume must survive re-exports. Hash bucketing makes
    rows_per_shard a TARGET (±O(sqrt) per shard), not an exact quota —
    exact quotas would need a global sort — and a shard left empty by
    hash variance (only plausible at tiny n) gets NO directory: iterate
    the manifest, which lists EVERY shard id 0..n_shards-1 with its
    count, not the directory listing.

    Rows with a NULL id are rejected up front (they would land in a
    non-numbered hive default partition).

    Layout: {path}/shard=<k>/part-*.{format}, ONE file per shard (the
    repartition puts each shard's rows in exactly one task), with the
    {path}/_shards_manifest.json written INSIDE the same atomic
    write-and-swap — a crash leaves either the previous complete export
    or none, never a torn tree. Returns the (shard, n_rows) manifest
    frame.

    Scale: one validate/count pass, one hash-keyed repartition (the only
    shuffle), one write pass, one k-row count aggregate. At 100 TB pick
    rows_per_shard so a shard ≈ a few GB.
    """
    import json as _json
    import math
    import os

    from vervectordb_spark.functions.hashing import seeded_md5_long
    from vervectordb_spark.sources.atomic import atomic_save

    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    n_null = df.filter(F.col(id_col).isNull()).count()
    if n_null:
        raise ValueError(
            f"write_training_shards: {n_null} rows have NULL {id_col!r}")
    n = df.count()
    if n == 0:
        raise ValueError("write_training_shards on an empty frame")
    if n_shards is None:
        n_shards = max(1, math.ceil(n / rows_per_shard))
    elif n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    sharded = df.withColumn(
        "shard",
        F.pmod(seeded_md5_long(F.col(id_col).cast("string"), seed),
               F.lit(n_shards)).cast("int"),
    ).repartition(n_shards, "shard")
    spark = df.sparkSession
    with atomic_save(path) as tmp:
        (sharded.write.mode("overwrite").partitionBy("shard")
         .format(format).save(tmp))
        # manifest counts come from the WRITTEN tree (no second source
        # scan) and land inside the same atomic swap
        counts = {int(r["shard"]): int(r["n_rows"])
                  for r in spark.read.format(format).load(tmp)
                  .groupBy("shard")
                  .agg(F.count("*").cast("bigint").alias("n_rows")).collect()}
        with open(os.path.join(tmp, "_shards_manifest.json"), "w") as fh:
            _json.dump(
                {"n_shards": n_shards,
                 "rows_per_shard_target": rows_per_shard,
                 "seed": seed, "total_rows": n,
                 "shards": {k: counts.get(k, 0) for k in range(n_shards)}},
                fh, sort_keys=True)
    return spark.createDataFrame(
        [(k, counts.get(k, 0)) for k in range(n_shards)],
        "shard int, n_rows bigint",
    )
