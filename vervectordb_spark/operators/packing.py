"""Sequence packing — grouping documents into fixed token-budget bins for
training (context-window packing).

`pack_by_token_offset` assigns each document a bin id from its cumulative
token offset within an ordered stream:

    bin = floor( (cumsum(tokens) - tokens) / budget )

i.e. documents are laid end-to-end and cut every `budget` tokens. A
document whose tokens straddle a cut belongs to the bin where it STARTS
(training pipelines split/overflow such documents downstream anyway; the
operator's contract is the deterministic layout, not the splitting). This
is the SQL-expressible formulation — exact greedy "close the bin when the
next doc would overflow" needs a sequential scan and packs no tighter than
this within ~1 doc per bin.

Scale posture: one window shuffle on the stream key. A single global
stream would serialize at 100 TB — callers partition the stream (by lang,
source, or an explicit hash shard: any per-shard packing is valid, and
trainers shard anyway). Within a shard the cumsum is Spark's running
window aggregate (partial spill-safe); the layout is reproducible because
the order column is explicit, never partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_by_token_offset(df: DataFrame, token_col: str, budget: int,
                         order_col: str, stream_col: str | None = None,
                         bin_col: str = "bin_id",
                         tiebreak_col: str | None = None) -> DataFrame:
    """Add `bin_col`: the document's bin in an end-to-end token layout cut
    every `budget` tokens, streamed per `stream_col` (or one global
    stream) in `order_col` order.

    Determinism: a running sum over a non-unique order is
    shuffle-order-dependent at the ties, so equal `order_col` values can
    swap bins between runs. Pass `tiebreak_col` (any unique id) when
    `order_col` can tie; with a unique order column the layout is
    reproducible as-is."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (
        Window.partitionBy(stream_col) if stream_col is not None
        else Window.partitionBy(F.lit(0))
    ).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    start = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        bin_col, F.floor(start.cast("double") / F.lit(float(budget))).cast("long")
    )


def pack_summary(df: DataFrame, token_col: str, budget: int,
                 order_col: str, stream_col: str | None = None) -> DataFrame:
    """Per-bin packing stats: (stream, bin_id, n_docs, sum_tokens) — the
    shape a packing-efficiency report reads."""
    packed = pack_by_token_offset(df, token_col, budget, order_col, stream_col)
    keys = ([stream_col] if stream_col else []) + ["bin_id"]
    return packed.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).alias("sum_tokens"),
    )
