"""Sketch / approximate-aggregate operators (beyond the reference surface).

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are shuffle-bound:
every distinct key (or every value) must move. The sketch family trades a
bounded, *known* error for fixed-size mergeable state — the building block
of any large-corpus stats layer:

  events_approx_distinct_bound   HLL++ distinct-count with verified rsd bound
  events_hll_mergeable           Datasketches HLL: union-of-partial-sketches
                                 == direct sketch (the mergeability law that
                                 makes sketches pre-aggregable per partition
                                 / per day / per shard)
  events_quantile_bound          percentile_approx with its Greenwald-Khanna
                                 rank-error guarantee verified against the
                                 actual rank

Oracle pattern: an approximate value can't be replayed bit-exact on DuckDB,
but its GUARANTEE can — each query emits the exact aggregate (DuckDB
computes it too) plus booleans asserting the sketch landed inside its
documented error bound (DuckDB emits the literal TRUE). A failed bound
breaks the hash-match, so the driver's correctness gate actually tests the
sketch contract, not just row counts.

Scale posture: all three are single-shuffle groupBy aggregates with
map-side partial sketch state (bytes per group, not rows); the quantile
rank check re-scans events once via a broadcast 1-row crossJoin — no
driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table


# ---------------------------------------------------------------------------
# HLL++ approx distinct with verified relative-error bound
# ---------------------------------------------------------------------------

@query(
    "events_approx_distinct_bound",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
       TRUE AS hll_within_3rsd
FROM events
GROUP BY event_type
""",
)
def events_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: exact countDistinct next to HLL++
    (`approx_count_distinct`, rsd=0.02) with the 3·rsd bound asserted as a
    column. The exact aggregate shuffles one row per (type, user) pair;
    the sketch shuffles ~1.5 KB per type regardless of user count — the
    version that survives a billion users. Both run in the SAME single
    groupBy (one shuffle total)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.approx_count_distinct("user_id", 0.02).alias("_approx"),
    )
    return agg.select(
        "event_type",
        "n_users",
        (
            F.abs(F.col("_approx") - F.col("n_users"))
            <= 3 * 0.02 * F.col("n_users")
        ).alias("hll_within_3rsd"),
    )


# ---------------------------------------------------------------------------
# Datasketches HLL mergeability: union of per-day sketches == direct sketch
# ---------------------------------------------------------------------------

@query(
    "events_hll_mergeable",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
       TRUE AS merged_eq_direct, TRUE AS est_within_5pct
FROM events
GROUP BY event_type
""",
)
def events_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability law sketches exist for: building one Datasketches
    HLL per (event_type, day) and unioning the days gives the SAME
    register state — hence the same estimate — as sketching the whole
    type directly. This is what lets a 100 TB pipeline keep a ~KB sketch
    column per partition/day/shard and answer global distinct queries by
    merge instead of re-scan. Emits `merged_eq_direct` (exact estimate
    equality) and `est_within_5pct` (estimate vs exact count; lgK=12 →
    rsd ≈ 1.6%, 5% ≈ 3σ)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("_day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("_sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_merged_est")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "_direct_est"
        ),
        F.countDistinct("user_id").alias("n_users"),
    )
    return merged.join(direct, on="event_type").select(
        "event_type",
        "n_users",
        (F.col("_merged_est") == F.col("_direct_est")).alias("merged_eq_direct"),
        (
            F.abs(F.col("_direct_est") - F.col("n_users"))
            <= 0.05 * F.col("n_users")
        ).alias("est_within_5pct"),
    )


# ---------------------------------------------------------------------------
# percentile_approx with its rank-error guarantee verified
# ---------------------------------------------------------------------------

@query(
    "events_quantile_bound",
    oracle="""
SELECT COUNT(*) AS n_values, TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
FROM events WHERE value IS NOT NULL
""",
)
def events_quantile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate quantiles (`percentile_approx`,
    accuracy=1000 → rank error ≤ N/1000) over event values, with the
    guarantee CHECKED: the returned p50/p95 must be actual dataset values
    whose true rank lies within p·N ± 2·εN (2× slack over the documented
    bound for merge effects). The approx aggregate is one shuffle of
    bounded per-partition summaries; the rank check re-scans events once
    against the broadcast 1-row result — house style, no driver collect."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    acc = 1000
    approx = ev.agg(
        F.percentile_approx("value", 0.5, acc).alias("_p50"),
        F.percentile_approx("value", 0.95, acc).alias("_p95"),
        F.count("*").alias("n_values"),
    )
    ranked = ev.crossJoin(F.broadcast(approx)).agg(
        F.first("n_values").alias("n_values"),
        F.sum(F.when(F.col("value") < F.col("_p50"), 1).otherwise(0)).alias("_lt50"),
        F.sum(F.when(F.col("value") <= F.col("_p50"), 1).otherwise(0)).alias("_le50"),
        F.sum(F.when(F.col("value") < F.col("_p95"), 1).otherwise(0)).alias("_lt95"),
        F.sum(F.when(F.col("value") <= F.col("_p95"), 1).otherwise(0)).alias("_le95"),
    )
    eps = 2.0 / acc

    def _rank_ok(lt: str, le: str, p: float) -> F.Column:
        n = F.col("n_values")
        return (F.col(lt) <= (p + eps) * n) & (F.col(le) >= (p - eps) * n)

    return ranked.select(
        "n_values",
        _rank_ok("_lt50", "_le50", 0.5).alias("p50_rank_ok"),
        _rank_ok("_lt95", "_le95", 0.95).alias("p95_rank_ok"),
    )
