"""Streaming ingest with periodic index refresh.

The reference's index model is explicit batch builds over a mutable store
(build_hnsw_index/build_ivf_index, vervectordb/__init__.py:367,411). Its
streaming analogue (SURVEY.md §7 milestone 6): the stream APPENDS to the
base vectors table; every N micro-batches a foreachBatch hook rebuilds the
IVF layout from the FULL table and atomically swaps it. Queries read the
last published index — derived state lags the stream boundedly but never
dangles (the batch operators stay the single source of truth).

At scale: the rebuild is the same partitionBy(cluster_id) job as offline;
swap = write to a versioned dir + repoint (here: overwrite, since
IVFIndex.save is itself an atomic parquet overwrite per component). For
incremental maintenance, assign NEW rows to existing centroids
(IVFIndex.from_centroids path) between full rebuilds — same pattern,
cheaper job."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ingest_with_index_refresh(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    refresh_every: int = 2,
    n_clusters: int = 4,
    seed: int = 42,
    dim: int | None = None,
):
    """Start a streaming query that appends vectors to
    `{store_path}/vectors` and rebuilds `{store_path}/ivf` every
    `refresh_every` micro-batches. Returns the StreamingQuery."""
    from vervectordb_spark.operators.ivf import IVFIndex

    state = {"batches_since_refresh": 0, "refreshes": 0}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df
        if dim is not None:
            out = out.filter(F.size("embedding") == dim)
        out.write.mode("append").parquet(f"{store_path}/vectors")
        state["batches_since_refresh"] += 1
        if state["batches_since_refresh"] >= refresh_every:
            spark = batch_df.sparkSession
            full = spark.read.parquet(f"{store_path}/vectors")
            idx = IVFIndex.build(full, n_clusters=n_clusters, seed=seed)
            idx.save(f"{store_path}/ivf")
            state["batches_since_refresh"] = 0
            state["refreshes"] += 1

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q._refresh_state = state  # test introspection
    return q
