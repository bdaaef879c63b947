"""Structured Streaming surface.

The reference has NO streaming (SURVEY.md §2.6); its model is "explicit
batch index builds over a mutable store" (vervectordb/__init__.py:367,411).
The streaming extension keeps that contract: streams APPEND to the base
table continuously; derived indexes (IVF/LSH/PQ) are rebuilt by periodic
batch jobs — so the batch operators stay the single source of truth and
indexes never dangle (fixing SURVEY §1.3 for the streaming case too).

Three pieces:

  stream_events        file-source readStream of the events fixture schema
                       (epoch-nanos ts, see schema.load_events)
  hourly_event_counts  watermarked tumbling-window agg — the streaming twin
                       of the batch `events_hourly` oracle query; same
                       logical plan, incrementalized by the engine
  sessionize_stateful  applyInPandasWithState custom stateful operator:
                       per-user session roll-up with a processing-time
                       timeout — the "operator Spark lacks" escape hatch
                       (SURVEY.md §2.6 streaming note)
  stream_ingest_vectors  append-only vector ingest into the store's table

Scale posture: the window agg shuffles on (window, event_type) with
watermark-bounded state; sessionization state is per-user (bounded by
active users, evicted on timeout). File source here, Kafka in production —
the plan after the source is identical.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fixture schema with ts as epoch-nanos (parquet TIMESTAMP(NANOS) is read
#: via nanosAsLong — schema.load_events)
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_events(spark: SparkSession, source_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of events parquet part-files landing in a dir."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def with_event_time(events: DataFrame) -> DataFrame:
    """epoch-nanos → TimestampType event time (micros precision) for
    watermarking. Arithmetic on `ts` stays integer; `event_time` exists
    only for the engine's watermark/window machinery."""
    return events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch `events_hourly` oracle query: tumbling
    1-hour windows per event_type. Watermark bounds state: windows older
    than max(event_time) - watermark are finalized and evicted."""
    return (
        with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type", "n_events", "approx_users", "sum_value",
        )
    )


#: output schema of sessionize_stateful
SESSION_SCHEMA = "user_id long, session_start_us long, n_events long, sum_value double"
_STATE_SCHEMA = "start_us long, last_us long, n long, total double"
_GAP_US = 30 * 60 * 1_000_000  # 30-min inactivity gap, like events_sessionize


def _session_fn(key, pdf_iter, state):
    """Per-user session accumulator: merge each micro-batch's events into
    the open session; emit closed sessions when the gap is exceeded or the
    state times out. Pure pandas per group — Arrow-batched."""
    import pandas as pd

    (user_id,) = key
    closed: list[tuple] = []
    if state.hasTimedOut:
        if state.exists:
            start_us, last_us, n, total = state.get
            closed.append((user_id, start_us, n, total))
            state.remove()
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "session_start_us", "n_events", "sum_value"])
        return

    if state.exists:
        start_us, last_us, n, total = state.get
    else:
        start_us = last_us = None
        n, total = 0, 0.0

    # a group's micro-batch spans MULTIPLE Arrow chunks with no global
    # order; sorting each chunk independently lets a later chunk carry
    # earlier timestamps (negative gaps, regressed last_us, wrong session
    # starts) -- concatenate first, sort once
    chunks = [pdf for pdf in pdf_iter if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts_ns, value in zip(pdf["ts"], pdf["value"]):
            ts_us = int(ts_ns) // 1000
            if last_us is not None and ts_us - last_us > _GAP_US:
                closed.append((user_id, start_us, n, total))
                start_us, n, total = ts_us, 0, 0.0
            if start_us is None:
                start_us = ts_us
            last_us = ts_us
            n += 1
            total += float(value)

    if start_us is not None:
        state.update((start_us, last_us, n, total))
        state.setTimeoutDuration(60_000)  # close idle sessions after 60s wall
    if closed:
        yield pd.DataFrame(closed, columns=["user_id", "session_start_us", "n_events", "sum_value"])


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: session roll-ups via applyInPandasWithState
    (the pattern for operators Spark's built-ins can't express). State is
    one tuple per active user; emits a row per CLOSED session."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_ingest_vectors(
    stream_df: DataFrame, table_path: str, checkpoint: str,
    emb_col: str = "embedding", dim: int | None = None,
):
    """Append-only streaming ingest into the vectors table (S2/S3 as a
    stream). The dim constraint becomes a streaming filter; violations are
    dropped (dead-letter them in production). Returns the StreamingQuery."""
    out = stream_df
    if dim is not None:
        out = out.filter(F.size(F.col(emb_col)) == dim)
    return (
        out.writeStream.format("parquet")
        .option("path", table_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# streaming corpus pipeline: the gate → dedup prefix of corpus_pipeline_e2e
# as a continuous ingest (documents landing as files → filtered, deduped,
# appended to the corpus table)
# ---------------------------------------------------------------------------

#: documents fixture schema (FIXTURES.md)
DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def stream_documents(spark: SparkSession, source_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of document parquet part-files landing in a dir."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def corpus_gate_dedup(docs: DataFrame, min_score: float = 0.8,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming corpus ingest: quality gate → exact dedup, continuously.

    * gate: the batch `quality_filter` exprs are pure map-side column
      projections, so the SAME operator runs unchanged on the stream —
      one logical definition for batch and streaming (the point of
      Structured Streaming);
    * dedup: `dropDuplicatesWithinWatermark` keyed on the 60-bit content
      hash. State is BOUNDED by the watermark: a duplicate arriving within
      the window is dropped, one arriving after the state expired lands
      (and the periodic batch `drop_exact_dups` compaction catches it) —
      the standard streaming/batch split for dedup at 100 TB, where
      forever-state on content hashes would grow with the corpus.

    Returns the streaming DataFrame (append-mode sink ready)."""
    from vervectordb_spark.operators.dedup import md5_long
    from vervectordb_spark.operators.text import quality_filter

    gated = quality_filter(docs, min_score=min_score).filter(F.col("keep"))
    return (
        gated.withColumn("content_hash", md5_long(F.col("text")))
        .withColumn("ingest_time", F.current_timestamp())
        .withWatermark("ingest_time", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        .drop("ingest_time")
    )


# ---------------------------------------------------------------------------
# stream-stream interval join: attribute purchases to preceding clicks
# ---------------------------------------------------------------------------

def click_purchase_attribution(clicks: DataFrame, purchases: DataFrame,
                               watermark: str = "2 hours",
                               attribution_window: str = "30 minutes",
                               ) -> DataFrame:
    """Stream-stream interval join — the attribution shape: each purchase
    joins the click(s) by the same user in the preceding
    `attribution_window`.

    Both sides carry a watermark; the time-interval predicate bounds the
    join state on BOTH sides (the engine evicts a buffered click once the
    purchase-side watermark passes click_time + window, and vice versa) —
    without the interval bound, stream-stream join state grows forever.
    Output rows appear once both watermarks pass; append mode.

    Scale posture: state is shuffled on user_id (same key both sides, one
    co-partitioned stateful join), size bounded by events-per-watermark
    horizon, not stream length.
    """
    c = (
        with_event_time(clicks)
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("event_time").alias("click_time"),
        )
    )
    p = (
        with_event_time(purchases)
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("event_time").alias("purchase_time"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"""
            c_user_id = p_user_id AND
            purchase_time >= click_time AND
            purchase_time <= click_time + INTERVAL {attribution_window}
            """
        ),
    ).select(
        F.col("c_user_id").alias("user_id"),
        "click_id", "purchase_id", "click_time", "purchase_time",
        "purchase_value",
    )


# ---------------------------------------------------------------------------
# streaming near-dup gate: persisted LSH band state, per-batch increments
# ---------------------------------------------------------------------------

def make_neardup_handler(state_path: str, text_col: str = "text",
                         id_col: str = "doc_id", num_hashes: int = 16,
                         bands: int = 4, shingle_n: int = 3,
                         threshold: float = 0.5,
                         max_bucket_size: int | None = None):
    """foreachBatch handler for a streaming MinHash near-dup gate with
    PERSISTED band state — the streaming twin of
    dedup.incremental_near_dup_pairs (the daily-crawl shape), run
    continuously per micro-batch.

    Per batch: sketch the batch once (signatures + shingles,
    lineage-cut), then reject a document when it near-duplicates
    (a) the ACCEPTED history — batch band entries joined against the
    persisted band table on (band, band_key), history buckets over
    max_bucket_size dropped (stop-bucket cap), candidates
    Jaccard-verified against the persisted shingle table; or
    (b) a SMALLER-ID batch peer (minhash_near_dup_pairs over the batch;
    the deterministic greedy tie-break — if the smaller peer itself was
    rejected its content is already represented in history, the standard
    LSH-gate approximation). Survivors are appended to
    `{state}/accepted`, their band entries/shingles to the state tables
    (so later batches dedup against them); rejects land in
    `{state}/rejected` with their best (dup_of, jaccard) witness.

    100 TB posture: history is never re-sketched — each increment costs
    |batch| sketch work + |batch|·bucket-occupancy join rows against
    state that only ever grows by accepted content. Exposed as a factory
    so batch replays (tests, backfills) can drive the EXACT closure
    foreachBatch drives.

    IDEMPOTENT under foreachBatch's at-least-once contract: every state
    table is partitioned by `_batch_id` and written with DYNAMIC
    partition overwrite, so a retried micro-batch (crash between the
    parquet writes and the checkpoint commit) REPLACES its own first
    attempt instead of appending duplicate state rows; and history reads
    exclude the retrying batch's own `_batch_id`, so a retry can never
    near-dup its documents against their first-attempt state (which
    would flip them from accepted to rejected). A committed-batch marker
    directory short-circuits the clean-replay case; the
    overwrite-plus-exclude pair is what carries correctness when the
    crash landed mid-write."""
    from vervectordb_spark.operators import dedup as D
    from vervectordb_spark.sources.fs import (
        state_exists, state_has_data, state_mkdirs)

    cap = max_bucket_size if max_bucket_size is not None \
        else D.DEFAULT_MAX_BUCKET_SIZE

    def _write_state(df: DataFrame, table: str, batch_id: int) -> None:
        (df.withColumn("_batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch_id")
         .parquet(f"{state_path}/{table}"))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if state_exists(
                spark, f"{state_path}/committed/_batch_id={batch_id}"):
            return  # clean replay of an already-committed batch
        not_self = F.col("_batch_id") != F.lit(int(batch_id))
        sk = D.minhash_signatures(
            batch_df, text_col, id_col, num_hashes, shingle_n
        ).localCheckpoint(eager=True)  # batch-sized; cut source lineage
        be = D.minhash_band_entries(sk, id_col, num_hashes, bands)

        witnesses = []
        if state_has_data(spark, f"{state_path}/bands"):
            hist_be = D._drop_oversized_buckets(
                spark.read.parquet(f"{state_path}/bands")
                .filter(not_self).drop("_batch_id"),
                ["band", "band_key"], cap)
            hist_sh = (spark.read.parquet(f"{state_path}/shingles")
                       .filter(not_self).drop("_batch_id"))
            cand = (be.select(F.col(id_col).alias("new_id"),
                              "band", "band_key")
                    .join(hist_be.withColumnRenamed(id_col, "hist_id"),
                          on=["band", "band_key"])
                    .select("new_id", "hist_id").distinct())
            witnesses.append(
                cand.join(sk.select(F.col(id_col).alias("new_id"),
                                    F.col("shingles").alias("_a")),
                          on="new_id")
                .join(hist_sh.select(F.col(id_col).alias("hist_id"),
                                     F.col("shingles").alias("_b")),
                      on="hist_id")
                .withColumn("jaccard",
                            D.jaccard_expr(F.col("_a"), F.col("_b")))
                .filter(F.col("jaccard") >= threshold)
                .select("new_id", F.col("hist_id").alias("dup_of"),
                        "jaccard"))
        # within-batch: reject the LARGER id of each verified pair
        self_pairs = D.minhash_near_dup_pairs(
            batch_df, text_col=text_col, id_col=id_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            threshold=threshold, max_bucket_size=cap)
        witnesses.append(self_pairs.select(
            F.greatest(F.col("src_id"), F.col("dst_id")).alias("new_id"),
            F.least(F.col("src_id"), F.col("dst_id")).alias("dup_of"),
            "jaccard"))

        rej = witnesses[0]
        for w in witnesses[1:]:
            rej = rej.unionByName(w)
        # one witness row per reject: best jaccard, smallest dup_of
        best = (rej.groupBy("new_id")
                .agg(F.max_by(F.struct("jaccard", "dup_of"),
                              F.struct(F.col("jaccard"),
                                       -F.col("dup_of"))).alias("w"))
                .select(F.col("new_id").alias(id_col),
                        F.col("w.dup_of").alias("dup_of"),
                        F.col("w.jaccard").alias("jaccard")))
        from vervectordb_spark.functions.checkpoint import (
            eager_checkpoint, release_blocks)

        best, _best_ids = eager_checkpoint(best)

        accepted = batch_df.join(best.select(id_col), on=id_col,
                                 how="left_anti")
        _write_state(accepted, "accepted", batch_id)
        _write_state(batch_df.join(best, on=id_col), "rejected", batch_id)
        acc_ids = accepted.select(id_col)
        _write_state(be.join(acc_ids, on=id_col), "bands", batch_id)
        _write_state(sk.select(id_col, "shingles").join(acc_ids, on=id_col),
                     "shingles", batch_id)
        state_mkdirs(spark, f"{state_path}/committed/_batch_id={batch_id}")
        # the witness checkpoint served its four derived writes: release
        # its blocks before the next micro-batch (finding #15)
        release_blocks(spark.sparkContext, _best_ids)

    return handle


def stream_neardup_ingest(stream_docs: DataFrame, state_path: str,
                          checkpoint: str, **kwargs):
    """Attach the near-dup gate to a document stream: one foreachBatch
    query, trigger-agnostic (availableNow for backfills, default for
    continuous ingest). kwargs forward to make_neardup_handler."""
    return (
        stream_docs.writeStream
        .foreachBatch(make_neardup_handler(state_path, **kwargs))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# streaming span dedup: persisted gram history, per-batch ExactSubstr cuts
# ---------------------------------------------------------------------------

def make_spancut_handler(state_path: str, gram_len: int = 8,
                         text_col: str = "text", id_col: str = "doc_id",
                         stop_gram_count: int | None = None):
    """foreachBatch handler for streaming span dedup with PERSISTED gram
    history — the streaming twin of
    spans.incremental_remove_duplicate_spans, run continuously per
    micro-batch (the make_neardup_handler pattern at span granularity).

    Per batch: cut the batch's duplicated spans against the accumulated
    gram history (plus its own within-batch repeats), land the cleaned
    documents in `{state}/cleaned`, and append the batch's RAW-text gram
    table to `{state}/grams`. History accumulates the SEEN text's grams
    (not the cleaned text's): a passage first cut in batch N must keep
    cutting in batch N+1 — accumulating post-cut grams would let every
    other occurrence of a boilerplate block survive.

    IDEMPOTENT under the at-least-once contract exactly like the
    near-dup gate: state partitioned by `_batch_id` + dynamic partition
    overwrite, history reads exclude the retrying batch's own id (a
    retry must not match its documents against their first-attempt
    grams — that would cut EVERYTHING in the batch), committed-marker
    short-circuit.

    Parity: driving this closure over batches produces cuts
    byte-identical to chaining the batch operators
    (incremental_remove_duplicate_spans + update_gram_history) over the
    same splits — pinned in tests/test_streaming.py. Scale posture: each
    increment is |batch| gram work + one key join against state
    (SCALE.md finding #12); persist `{state}/grams` bucketed on gram_h
    to drop the history-reshuffle constant."""
    from vervectordb_spark.operators import spans as SP
    from vervectordb_spark.sources.fs import (
        state_exists, state_has_data, state_mkdirs)

    def _write_state(df: DataFrame, table: str, batch_id: int) -> None:
        (df.withColumn("_batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("_batch_id")
         .parquet(f"{state_path}/{table}"))

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if state_exists(
                spark, f"{state_path}/committed/_batch_id={batch_id}"):
            return  # clean replay of an already-committed batch
        if state_has_data(spark, f"{state_path}/grams"):
            hist = (spark.read.parquet(f"{state_path}/grams")
                    .filter(F.col("_batch_id") != F.lit(int(batch_id)))
                    .groupBy(*SP.GRAM_KEY)
                    .agg(F.sum("n_occurrences").cast("bigint")
                         .alias("n_occurrences")))
        else:
            hist = spark.createDataFrame(
                [], "gram_h long, gram_h2 long, n_occurrences long")
        cleaned = SP.incremental_remove_duplicate_spans(
            batch_df, hist, gram_len, text_col, id_col,
            stop_gram_count=stop_gram_count)
        _write_state(cleaned, "cleaned", batch_id)
        _write_state(SP.gram_history(batch_df, gram_len, text_col, id_col),
                     "grams", batch_id)
        state_mkdirs(spark, f"{state_path}/committed/_batch_id={batch_id}")

    return handle


def stream_spancut_ingest(stream_docs: DataFrame, state_path: str,
                          checkpoint: str, **kwargs):
    """Attach streaming span dedup to a document stream (one foreachBatch
    query, availableNow trigger for backfills). kwargs forward to
    make_spancut_handler."""
    return (
        stream_docs.writeStream
        .foreachBatch(make_spancut_handler(state_path, **kwargs))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
