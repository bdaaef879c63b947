"""Incremental materialized rollup (continuous aggregate) — the
TimescaleDB-continuous-aggregate / Druid-rollup pattern the reference has
no analogue for (its only aggregate state is the PQ codebook refit,
vervectordb/__init__.py:489-520; cited for parity bookkeeping only).

At 100 TB an hourly dashboard cannot rescan history per refresh. The
classic fix is ALGEBRAIC partial aggregation: keep per-(group) partial
states that merge associatively, append a partial per arriving batch,
and finalize at read time:

    count      -> SUM of partial counts
    sum        -> SUM of partial DECIMAL sums (exact, order-independent —
                  a double sum would drift with merge order and break
                  both determinism and the oracle replay)
    min / max  -> MIN / MAX of partial bounds
    avg        -> derived at finalize: sum / count (never stored)
    distinct   -> HLL sketch partials, hll_union_agg at merge — the
                  mergeability law pinned in queries_sketch.py is exactly
                  what makes a pre-aggregated distinct column possible;
                  the estimate carries the standard HLL rsd error

The INCREMENTAL INVARIANT — merge(partials of any partition of the data)
== direct aggregate of all of it — is the whole point, and it holds
exactly for every measure above except the HLL estimate (identical
sketches, hence identical estimates, when the same rows land in the same
groups; the estimate-vs-exact error is the usual HLL bound). The
`events_rollup_incremental` oracle gates this: Spark answers from a
3-way-split merge, DuckDB from one direct GROUP BY.

Persistence (`ContinuousRollup`) rides `sources/versioned.py`: each
refresh APPENDS a partial-rows version (cost = O(batch), never a history
rescan; snapshot-isolated, time-travelable), reads merge all live
partials (read amplification = number of refreshes since compaction),
and `compact()` OVERWRITES with the merged state — one row per group —
resetting read cost to O(groups). Old versions stay readable until
vacuumed, so a reader pinned to a pre-compaction snapshot never breaks.

100 TB posture: refresh shuffles only the batch (one partial agg, group
keys wide); read shuffles only partial rows (groups x refreshes, not
events); compaction is the same bounded merge. Nothing rescans the raw
event history, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: exact, order-independent sum type for the double `value` column
_DEC = "decimal(18,2)"
_HLL_LGK = 12  # Datasketches lgConfigK, the queries_sketch.py setting


def partial_rollup(batch: DataFrame, keys: list[str], value_col: str,
                   distinct_col: str | None = None) -> DataFrame:
    """ONE batch -> one partial row per group: (keys..., n, sum_v, min_v,
    max_v[, users_sk]). Map-side combine reduces each task to its group
    cardinality before the exchange."""
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.col(value_col).cast(_DEC)).alias("sum_v"),
        F.min(F.col(value_col).cast(_DEC)).alias("min_v"),
        F.max(F.col(value_col).cast(_DEC)).alias("max_v"),
    ]
    if distinct_col is not None:
        aggs.append(
            F.hll_sketch_agg(distinct_col, F.lit(_HLL_LGK)).alias("users_sk")
        )
    return batch.groupBy(*keys).agg(*aggs)


def merge_rollup(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Merge partial rows (from any number of batches) into one partial
    row per group — the associative combine. Input and output share the
    partial schema, so merges chain and compactions are just merges."""
    has_sk = "users_sk" in partials.columns
    aggs = [
        F.sum("n").alias("n"),
        F.sum("sum_v").cast(_DEC).alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    ]
    if has_sk:
        aggs.append(F.hll_union_agg("users_sk").alias("users_sk"))
    return partials.groupBy(*keys).agg(*aggs)


def finalize_rollup(partials: DataFrame) -> DataFrame:
    """Partial state -> the user-facing aggregate row: exact count / sum /
    min / max, derived avg (one division, at the end), and the HLL
    distinct estimate when present."""
    out = partials.select(
        *[c for c in partials.columns if c not in ("users_sk",)],
        *([F.hll_sketch_estimate("users_sk").alias("n_distinct_est")]
          if "users_sk" in partials.columns else []),
    )
    return out.withColumn(
        "avg_v", (F.col("sum_v").cast("double") / F.col("n")),
    )


class ContinuousRollup:
    """A persisted continuous aggregate over an append-only fact stream.

    refresh(batch) appends ONE partial version (cost O(batch));
    read() merges live partials and finalizes;
    compact() overwrites with the merged state (one row per group).
    """

    def __init__(self, spark: SparkSession, path: str, keys: list[str],
                 value_col: str, distinct_col: str | None = None):
        from vervectordb_spark.sources.versioned import VersionedTable

        self.spark = spark
        self.keys = keys
        self.value_col = value_col
        self.distinct_col = distinct_col
        self.table = VersionedTable.create(spark, path)

    def refresh(self, batch: DataFrame, batch_id: int | None = None) -> dict:
        """Fold one arriving batch in: one partial aggregate of the batch,
        one versioned append. The raw events are NOT retained here — the
        rollup is the materialization, the fact table lives elsewhere.

        With `batch_id`, the commit is IDEMPOTENT: the committed-id set
        is carried forward in the HEAD manifest's meta (one read, O(1)
        per refresh instead of an O(n_refreshes) history scan, and it
        survives vacuum of old manifests — a late re-delivery of a
        vacuumed batch still skips instead of double-counting; ADVICE
        r5). A re-delivery of an already-committed batch (a foreachBatch
        retry after a sink-side failure) is a no-op — the
        transactional-sink handshake Structured Streaming expects (the
        Delta/Iceberg txn-id pattern)."""
        if batch_id is None:
            p = partial_rollup(batch, self.keys, self.value_col,
                               self.distinct_col)
            return self.table.append(p, op="append")
        if batch_id in self.committed_batches():
            return self.table.manifest()  # already folded in — no-op
        p = partial_rollup(batch, self.keys, self.value_col,
                           self.distinct_col)
        return self.table.append(
            p, op=f"rollup-batch:{batch_id}",
            meta_fn=lambda m: {
                **m,
                "rollup_batches": sorted(
                    set(m.get("rollup_batches", [])) | {int(batch_id)}),
            },
        )

    def committed_batches(self) -> set[int]:
        """Batch ids folded into the current head — read from the head
        manifest's carried-forward meta (never a history walk)."""
        try:
            man = self.table.manifest()
        except FileNotFoundError:
            return set()
        return set(man.get("meta", {}).get("rollup_batches", []))

    def streaming_refresh(self, stream: DataFrame, checkpoint: str,
                          available_now: bool = True):
        """Continuous maintenance from a readStream: each micro-batch
        folds in via foreachBatch -> refresh(batch, batch_id), so the
        rollup stays current without ever rescanning history, and the
        batch-id handshake keeps retries exactly-once. Returns the
        started StreamingQuery (caller awaits/stops)."""
        writer = (
            stream.writeStream
            .foreachBatch(lambda b, bid: self.refresh(b, batch_id=bid))
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def partials(self) -> DataFrame:
        return self.table.read()

    def read(self) -> DataFrame:
        """The current aggregate: merge live partials, finalize. Cost is
        O(groups x refreshes-since-compaction), independent of the raw
        event volume those refreshes folded in."""
        return finalize_rollup(merge_rollup(self.partials(), self.keys))

    def compact(self) -> dict:
        """Collapse partials to one row per group (copy-on-write
        overwrite — pinned pre-compaction readers keep their snapshot).
        `sum_v` decimal merges are exact, so compaction never changes
        read() results; the HLL union is likewise deterministic."""
        merged = merge_rollup(self.partials(), self.keys)
        return self.table.overwrite(merged)
