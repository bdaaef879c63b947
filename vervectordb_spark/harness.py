"""Evaluation harness — the reference's example-harness operators H1–H4
(SURVEY.md §2.7, examples/datawhale.py) as reusable distributed metrics.

  H1 calculate_recall     |result ∩ truth| / |truth|   (:142-148)
  H2 recall_comparison    ANN recall vs brute-force oracle over a query set
                          (:151-232) — the ANN acceptance gate (§5)
  H3 latency harness      per-method wall-clock over a query set (:209-230)
  H4 compression metrics  PQ ratio + mean-abs reconstruction error (:49-61)

Unlike the reference (prints, never asserts), these return values and are
asserted in tests. Recall over a query SET runs as ONE Spark job per
method (batch kernels), not a per-query loop.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calculate_recall(result_ids: Sequence, truth_ids: Sequence) -> float:
    """H1 — driver-side, for collected top-k lists (k is small)."""
    truth = set(truth_ids)
    if not truth:
        return 0.0
    return len(set(result_ids) & truth) / len(truth)


def recall_df(results: DataFrame, truth: DataFrame,
              query_id: str = "query_id", id_col: str = "vec_id") -> DataFrame:
    """H1 distributed: per-query recall of `results` against `truth`
    (both (query_id, id_col) relations). One join + one aggregation."""
    # duplicate (query, id) result rows (multi-probe unions) must count
    # once — without the distinct, per-query recall could exceed 1.0 and
    # inflate the acceptance gate's mean
    hits = (
        results.select(query_id, id_col).distinct()
        .join(truth.select(query_id, id_col).distinct(), on=[query_id, id_col])
        .groupBy(query_id)
        .agg(F.count("*").alias("n_hit"))
    )
    sizes = truth.groupBy(query_id).agg(F.count("*").alias("n_truth"))
    return sizes.join(hits, on=query_id, how="left").select(
        query_id,
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_truth")).alias("recall"),
    )


def batch_recall(corpus: DataFrame, queries: DataFrame,
                 method: Callable[[DataFrame, DataFrame, int], DataFrame],
                 top_k: int = 10) -> float:
    """H2 — mean recall@k of `method` vs the exact batch kernel, computed
    with two batched jobs + one join (never a per-query loop).

    `method(corpus, queries, top_k)` returns (query_id, vec_id, ...)."""
    from vervectordb_spark.operators.search import batch_topk

    truth = batch_topk(corpus, queries, top_k=top_k).select("query_id", "vec_id")
    approx = method(corpus, queries, top_k).select("query_id", "vec_id")
    per_query = recall_df(approx, truth)
    row = per_query.agg(F.avg("recall").alias("r")).collect()[0]
    return float(row["r"] or 0.0)


def time_method(fn: Callable[[], object], repeats: int = 1) -> dict:
    """H3 — wall-clock a thunk (first call includes plan+warmup; use
    repeats>1 for steady-state)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return {
        "total_s": round(sum(times), 4),
        "best_s": round(min(times), 4),
        "runs": repeats,
    }


def compression_metrics(codec, df: DataFrame, emb_col: str = "embedding") -> dict:
    """H4 — PQ ratio (structural) + mean-abs reconstruction error
    (distributed pass)."""
    return {
        "compression_ratio": codec.compression_ratio(),
        "mean_abs_error": float(codec.reconstruction_error(df, emb_col=emb_col)),
    }
