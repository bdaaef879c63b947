"""Relational + event-stream query registrations.

The reference has NO joins, group-bys, windows, or streaming (SURVEY.md
§2.6 — grep-verified); these queries are the north-star pipeline posture
(SURVEY.md §2.8): the relational operators a 100 TB training-data pipeline
runs around the vector operators, each with a bit-exact DuckDB oracle.

Parity rules for this module:
  * money/quantity aggregates: cast each value to DECIMAL first, sum the
    decimals (exact, order-independent), convert to double at the END;
    never sum raw doubles (order-dependent rounding);
  * ratios/averages: one decimal-sum ÷ one count, as double, then round;
  * event timestamps: epoch-nanos int64 end-to-end (see schema.load_events)
    — bucketing/gap math is integer `div`/`%`, never double division.

Scale notes: dims (region/nation/supplier/customer at TPC-H ratios) are
broadcast; fact-fact joins shuffle on their keys with AQE handling skew;
window functions partition by high-cardinality keys (user_id, nation), so
no single-partition sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_events, load_table

_NS_PER_HOUR = 3_600_000_000_000
_US_PER_HOUR = 3_600_000_000
_SESSION_GAP_NS = 30 * 60 * 1_000_000_000  # 30 min
_SESSION_GAP_US = 30 * 60 * 1_000_000


def _dec_sum(col: str, scale: int = 2) -> F.Column:
    """Exact order-independent sum: per-value decimal cast, decimal sum."""
    return F.sum(F.col(col).cast(f"decimal(18,{scale})"))


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: full-scan partial agg over the fact table
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → pushed date filter → hash partial agg → final agg. The
    canonical 'does partial aggregation happen map-side' probe: shuffle
    volume is |groups| × partitions, not |rows|."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum("l_quantity").cast("double").alias("sum_qty"),
            _dec_sum("l_extendedprice").cast("double").alias("sum_base_price"),
            F.round(
                _dec_sum("l_discount").cast("double") / F.count("*"), 6
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# multi-join star query: revenue per nation (broadcast dims)
# ---------------------------------------------------------------------------

@query(
    "revenue_by_nation",
    oracle="""
SELECT n.n_name AS nation,
  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross_revenue,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n    ON c.c_nationkey = n.n_nationkey
JOIN region r    ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name
""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape. Join order: fact × fact (lineitem⋈orders) shuffles on
    orderkey. Only the BOUNDED dims (nation=25, region=5 rows at every SF)
    get broadcast hints; customer and supplier scale linearly with SF, so
    they take shuffle joins and AQE upgrades them to broadcast at runtime
    whenever the measured size is small — a forced broadcast hint on a
    scaling table is the plan that collects millions of rows to the driver
    at 100× (measured: 2× run-to-run variance at sf10 from rebuilding a
    1.5M-row broadcast hash table)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        _dec_sum("l_extendedprice").cast("double").alias("gross_revenue"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# window functions: top-3 customers by order revenue within each nation
# ---------------------------------------------------------------------------

@query(
    "top_customers_per_nation",
    oracle="""
WITH rev AS (
  SELECT c.c_custkey, n.n_name AS nation,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY c.c_custkey, n.n_name
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY nation ORDER BY revenue DESC, c_custkey
  ) AS rk
  FROM rev
)
SELECT nation, c_custkey, revenue, rk::INTEGER AS rank
FROM ranked WHERE rk <= 3
""",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    rev = (
        # customer scales with SF — no broadcast hint; AQE upgrades the
        # shuffle join to broadcast at runtime when it measures small
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", F.col("n_name").alias("nation"))
        .agg(_dec_sum("o_totalprice").cast("double").alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("nation", "c_custkey", "revenue", "rank")
    )


# ---------------------------------------------------------------------------
# events: tumbling-window aggregation (batch twin of the streaming agg)
# ---------------------------------------------------------------------------

@query(
    "events_hourly",
    oracle=f"""
SELECT epoch_us(ts) // {_US_PER_HOUR} AS hour_bucket,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows per event type. The streaming variant
    (streaming/ingest.py) is the same logical plan behind readStream +
    watermark; this batch twin is the oracle-checkable path. Bucket math is
    integer division on epoch-nanos."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.expr(f"ts div {_NS_PER_HOUR}").alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(_dec_sum("value").cast("double"), 6).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# events: sessionization via gap detection (lag + cumulative window sum)
# ---------------------------------------------------------------------------

@query(
    "events_sessionize",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
         OR lag(epoch_us(ts)) OVER w IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id,
    SUM(new_session) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM gaps
)
SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
  COUNT(*) AS n_events,
  ROUND(COUNT(*)::DOUBLE / COUNT(DISTINCT session_id), 6) AS events_per_session
FROM sess GROUP BY user_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic sessionization: 30-min inactivity gap starts a new session.
    lag + cumulative sum over (user_id, ts) — partitioned by user, so the
    sort is per-user, never global. Timestamps are compared in microseconds
    (matching DuckDB's timestamp precision) via integer division."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wc = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(wc))
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(
            F.count("*").cast("double") / F.countDistinct("session_id"), 6
        ).alias("events_per_session"),
    )


# ---------------------------------------------------------------------------
# events: JSON property extraction + aggregation
# ---------------------------------------------------------------------------

@query(
    "events_json_extract",
    oracle="""
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
  COUNT(*) AS n
FROM events
GROUP BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction in the scan
    projection (get_json_object is codegen'd JVM-side — no UDF)."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_sum"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# skew: salted two-phase aggregation (semantics == plain GROUP BY)
# ---------------------------------------------------------------------------

@query(
    "events_type_counts_salted",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
)
def events_type_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical skew case: millions of rows, 5 hot keys. Salted
    two-phase agg spreads each key over 16 reducers; the oracle is the
    plain GROUP BY — salting must be invisible in the result."""
    from vervectordb_spark.functions.skew import salted_agg

    ev = load_events(spark, sf_dir)
    return salted_agg(
        ev,
        keys=["event_type"],
        partial_aggs=[
            F.count("*").alias("_c"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_s"),
        ],
        final_aggs=[
            F.sum("_c").alias("n_events"),
            F.sum("_s").cast("double").alias("sum_value"),
        ],
        n_salts=16,
        salt_col="event_id",
    )


# ---------------------------------------------------------------------------
# as-of join: each event matched to the user's latest prior purchase
# ---------------------------------------------------------------------------

@query(
    "events_asof_purchase",
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
tagged AS (
  SELECT user_id, ts_us,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS tag,
         event_id, event_type
  FROM ev
),
matched AS (
  SELECT event_id, event_type, user_id, ts_us,
    MAX(CASE WHEN tag = 0 THEN ts_us END) OVER (
      PARTITION BY user_id ORDER BY ts_us, tag
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS matched_ts
  FROM tagged
)
SELECT user_id,
  COUNT(*) AS n_events,
  COUNT(matched_ts) AS n_matched,
  CAST(SUM(ts_us - matched_ts) AS BIGINT) AS total_lag_us
FROM matched
WHERE event_type <> 'purchase'
GROUP BY user_id
""",
)
def events_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): every non-purchase event
    picks up the user's most recent purchase at-or-before its timestamp;
    verified via per-user match-count + exact lag sums (int64 µs)."""
    from vervectordb_spark.operators.asof import asof_join_backward

    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us"), "event_type"
    )
    left = ev.filter(F.col("event_type") != "purchase")
    right = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join_backward(
        left, right, key="user_id", left_ts="ts_us", right_ts="ts_us"
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count("matched_ts").alias("n_matched"),
        F.sum(F.col("ts_us") - F.col("matched_ts")).alias("total_lag_us"),
    )


# ---------------------------------------------------------------------------
# range (non-equi) join: events bucketed into value tiers
# ---------------------------------------------------------------------------

@query(
    "events_value_tiers",
    oracle="""
WITH tiers(tier, lo, hi) AS (
  VALUES ('low', 0.0, 5.0), ('mid', 5.0, 20.0), ('high', 20.0, 1e9)
)
SELECT t.tier, COUNT(*) AS n_events,
  COUNT(DISTINCT e.event_type) AS n_types
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier
""",
)
def events_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a tiny tier dim: the non-equi predicate plans as
    BroadcastNestedLoopJoin — correct for |tiers| ~ handfuls. (A big-big
    range join would bucketize the range key first; see operators/asof.py
    for the ordered variant.)"""
    ev = load_events(spark, sf_dir)
    tiers = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 1e9)],
        "tier string, lo double, hi double",
    )
    joined = ev.join(
        F.broadcast(tiers),
        (ev.value >= tiers.lo) & (ev.value < tiers.hi),
    )
    return joined.groupBy("tier").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# rollup: hierarchical aggregates with grand total
# ---------------------------------------------------------------------------

@query(
    "pricing_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
  COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (flag, status): per-group + per-flag subtotals + grand total
    in one pass (Expand + single shuffle, not three scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        _dec_sum("l_quantity").cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# interval self-join via time-bucket banding (the scalable pattern)
# ---------------------------------------------------------------------------

_WINDOW_US = 60_000_000  # pair events within 60 s


@query(
    "events_interval_pairs",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
),
pairs AS (
  SELECT a.user_id, a.event_id AS src_event, b.event_id AS dst_event
  FROM ev a JOIN ev b
    ON a.user_id = b.user_id
   AND a.event_type = 'click' AND b.event_type = 'purchase'
   AND b.ts_us >= a.ts_us AND b.ts_us - a.ts_us <= {_WINDOW_US}
)
SELECT user_id, COUNT(*) AS n_pairs,
       COUNT(DISTINCT src_event) AS n_clicks_converted
FROM pairs GROUP BY user_id
""",
)
def events_interval_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: click→purchase conversions within 60 s per user.
    Implemented with time-BUCKET banding: each side joins on (user_id,
    bucket) where the left probes its own and the next bucket — join
    fan-out is bucket-local, never the |A|×|B| range cross-join. The exact
    interval predicate filters after the equi-join, so Catalyst plans a
    hash join, not a nested loop."""
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", F.expr("ts div 1000").alias("ts_us"), "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("event_id").alias("src_event"),
        F.col("ts_us").alias("src_ts"),
        F.explode(
            F.array(
                F.expr(f"ts_us div {_WINDOW_US}"),
                F.expr(f"ts_us div {_WINDOW_US}") + 1,
            )
        ).alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("dst_event"),
        F.col("ts_us").alias("dst_ts"),
        F.expr(f"ts_us div {_WINDOW_US}").alias("bucket"),
    )
    pairs = clicks.join(purchases, on=["user_id", "bucket"]).filter(
        (F.col("dst_ts") >= F.col("src_ts"))
        & (F.col("dst_ts") - F.col("src_ts") <= _WINDOW_US)
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("src_event").alias("n_clicks_converted"),
    )


# ---------------------------------------------------------------------------
# set operations: INTERSECT / EXCEPT over derived relations
# ---------------------------------------------------------------------------

@query(
    "users_set_ops",
    oracle="""
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
purchasers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
both_u AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM purchasers),
only_click AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM purchasers)
SELECT
  (SELECT COUNT(*) FROM both_u) AS n_both,
  (SELECT COUNT(*) FROM only_click) AS n_click_only,
  (SELECT CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM only_click) AS click_only_id_sum
""",
)
def users_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT (distinct set semantics). Both inputs are distinct
    key sets, so INTERSECT = inner-match and EXCEPT = null-match of ONE
    left join; all three scalars fold into a single aggregate — one job,
    no driver-side counting (same shape as events_funnel)."""
    ev = load_events(spark, sf_dir)
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    purchasers = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_purchaser", F.lit(True))
    )
    joined = clickers.join(purchasers, "user_id", "left")
    return joined.agg(
        F.count(F.when(F.col("is_purchaser"), 1)).cast("long").alias("n_both"),
        F.count(F.when(F.col("is_purchaser").isNull(), 1))
        .cast("long")
        .alias("n_click_only"),
        F.coalesce(
            F.sum(F.when(F.col("is_purchaser").isNull(), F.col("user_id"))),
            F.lit(0),
        )
        .cast("long")
        .alias("click_only_id_sum"),
    )


# ---------------------------------------------------------------------------
# anti-join / NOT EXISTS — customers that never ordered, per nation
# ---------------------------------------------------------------------------

@query(
    "customers_without_orders",
    oracle="""
SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (never a per-row subquery): the
    anti-join shuffles on the key (or broadcasts the distinct key set);
    the nation dim joins broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    no_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )
    return (
        no_orders.join(F.broadcast(nation),
                       no_orders.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# exact percentiles — linear-interpolated quantiles per event type
# ---------------------------------------------------------------------------

@query(
    "events_value_percentiles",
    oracle="""
SELECT event_type,
  ROUND(quantile_cont(value, 0.5), 6) AS p50,
  ROUND(quantile_cont(value, 0.9), 6) AS p90,
  ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1
""",
)
def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`). Exact quantiles sort within each group — at
    100 TB swap for approx_percentile (t-digest, mergeable partial aggs)
    when a 1e-3 relative error is acceptable; this is the oracle-able
    exact path."""
    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# CUBE — all grouping-set rollups of (status, priority) in one pass
# ---------------------------------------------------------------------------

@query(
    "orders_cube",
    oracle="""
SELECT
  COALESCE(o_orderstatus, '<all>') AS status,
  COALESCE(o_orderpriority, '<all>') AS priority,
  GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(status, priority): all four grouping sets in one shuffle
    (partial-agg per set, not four scans). The grouping id is the
    explicit GROUPING(a)*2+GROUPING(b) bitmask on both engines; money
    sums are exact DECIMAL partials cast at the end."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            # grouping() is only legal inside the cube's agg list
            (F.grouping("o_orderstatus").cast("int") * 2
             + F.grouping("o_orderpriority").cast("int")).alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# funnel — ordered stage progression per user (view -> click -> purchase)
# ---------------------------------------------------------------------------

def funnel_stage_users(ev, steps, user_col="user_id", ts_col="ts",
                       type_col="event_type"):
    """Per-stage user tables for an ordered funnel: stage k keeps users
    whose first step-k event is strictly AFTER their first step-(k-1)
    event. One partial-agg shuffle + one join per stage; joins broadcast
    when the surviving user set is small (it shrinks every stage)."""
    stages = []
    prev = None
    for i, step in enumerate(steps):
        src = ev.filter(F.col(type_col) == step)
        if prev is None:
            cur = src.groupBy(user_col).agg(F.min(ts_col).alias(f"_t{i}"))
        else:
            cur = (
                src.join(prev, on=user_col)
                .filter(F.col(ts_col) > F.col(f"_t{i-1}"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(f"_t{i}"))
            )
        stages.append(cur)
        prev = cur
    return stages


@query(
    "events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t0 FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_users
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user advances a stage
    only with an event strictly after their first event of the previous
    stage. Stage counts compose as cross-joined 1-row aggregates — ONE
    job, no driver-side counting."""
    ev = load_events(spark, sf_dir)
    v, c, p = funnel_stage_users(ev, ["view", "click", "purchase"])
    return (
        v.agg(F.count("*").alias("n_view_users"))
        .crossJoin(c.agg(F.count("*").alias("n_click_users")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_users")))
    )


# ---------------------------------------------------------------------------
# cohort retention — signup week × activity-week offset
# ---------------------------------------------------------------------------

_NS_PER_WEEK = 7 * 24 * 3_600_000_000_000
_US_PER_WEEK = 7 * 24 * 3_600_000_000


@query(
    "events_cohort_retention",
    oracle=f"""
WITH cohort AS (
  SELECT user_id, MIN(epoch_us(ts)) // {_US_PER_WEEK} AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY 1
),
activity AS (
  SELECT DISTINCT c.cohort_week,
    (epoch_us(e.ts) // {_US_PER_WEEK}) - c.cohort_week AS week_offset,
    e.user_id
  FROM events e JOIN cohort c ON e.user_id = c.user_id
  WHERE (epoch_us(e.ts) // {_US_PER_WEEK}) - c.cohort_week BETWEEN 0 AND 3
)
SELECT cohort_week, week_offset, CAST(COUNT(*) AS BIGINT) AS n_active_users
FROM activity GROUP BY 1, 2
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped by signup week, counted
    as active in each of the following 4 weeks if ANY event lands there.
    Week bucketing is exact integer `div` on epoch-nanos — NEVER double
    division (epoch-ns exceeds double's 2^53 exact range; see
    schema.load_events). ns div ns_per_week == µs div µs_per_week by the
    nested-floor identity, so the DuckDB epoch_us twin is exact. Shape:
    one partial-agg per user, one join on user (broadcast when the
    cohort is small), one distinct + final agg."""
    ev = load_events(spark, sf_dir)
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.expr(f"min(ts) div {_NS_PER_WEEK}").alias("cohort_week"))
    )
    activity = (
        ev.join(cohort, on="user_id")
        .withColumn(
            "week_offset",
            F.expr(f"ts div {_NS_PER_WEEK}") - F.col("cohort_week"),
        )
        .filter(F.col("week_offset").between(0, 3))
        .select("cohort_week", "week_offset", "user_id")
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").alias("n_active_users")
    )


# ---------------------------------------------------------------------------
# events: rolling 1-hour RANGE-frame window per user (the time-based frame
# the tumbling/hopping aggs can't express: every event sees its own
# trailing hour)
# ---------------------------------------------------------------------------

@query(
    "events_rolling_1h",
    oracle=f"""
SELECT event_id, user_id,
  COUNT(*) OVER w AS roll_n,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 6) AS roll_value
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_ns(ts)
  RANGE BETWEEN {_NS_PER_HOUR} PRECEDING AND CURRENT ROW
)
""",
)
def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour activity per event: RANGE frame over epoch-nanos,
    partitioned by user_id (high cardinality — no single-partition sort).
    The frame sum is an exact decimal (order-free within the frame, so
    engines agree bit-for-bit even though their in-frame orders differ);
    events sharing a timestamp are RANGE peers in both engines."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"))
        .rangeBetween(-_NS_PER_HOUR, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("roll_n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double"), 6
        ).alias("roll_value"),
    )


# ---------------------------------------------------------------------------
# pivot: long → wide event-type matrix per day (classic BI reshape)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "events_daily_pivot",
    oracle=f"""
SELECT epoch_us(ts) // {24 * 3_600_000_000} AS day_bucket,
  {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY 1
""",
)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide reshape: one row per day, one count column per event type
    (`groupBy().pivot(values)` with the value list PINNED — an unpinned
    pivot runs an extra distinct job to discover columns and makes the
    output schema data-dependent, which breaks at 100 TB on both counts).
    Catalyst lowers it to the same conditional aggregation the oracle
    spells out: ONE shuffle of (day, 5 partial counts)."""
    ev = load_events(spark, sf_dir)
    ns_per_day = 24 * 3_600_000_000_000
    return (
        ev.groupBy(F.expr(f"ts div {ns_per_day}").alias("day_bucket"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


# ---------------------------------------------------------------------------
# GROUPING SETS through the raw-SQL surface — the one aggregation shape
# cube/rollup don't cover (explicit, non-hierarchical set list), run via
# spark.sql over registered views to exercise the SQL entry path
# (sources.tables.register_sql_views) inside the oracle gate.
# ---------------------------------------------------------------------------

@query(
    "orders_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets — per-status totals, per-priority totals, and
    the grand total in ONE pass (Catalyst lowers to a single Expand +
    aggregate: one scan, one shuffle, not three jobs). Runs through the
    raw-SQL surface over a registered view: the engine's spark.sql entry
    path is oracle-gated here, not just the DataFrame API."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_gs_orders"
    )
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS total_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


# ---------------------------------------------------------------------------
# NTILE — equal-frequency quartile assignment per event type
# ---------------------------------------------------------------------------

@query(
    "events_value_quartiles",
    oracle="""
WITH q AS (
  SELECT event_type, value,
    NTILE(4) OVER (PARTITION BY event_type
                   ORDER BY value, event_id) AS quartile
  FROM events
)
SELECT event_type, CAST(quartile AS INT) AS quartile,
  COUNT(*) AS n_events,
  ROUND(MIN(value), 6) AS lo, ROUND(MAX(value), 6) AS hi
FROM q GROUP BY event_type, quartile
""",
)
def events_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quartiles per event type (NTILE over a
    deterministic order — value ties broken by event_id so the bucket
    boundaries replay identically), rolled up to per-bucket count and
    value range. The window partitions by type; min/max are the only
    floats and are order-independent."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    q = ev.select(
        "event_type", "value", F.ntile(4).over(w).alias("quartile")
    )
    return q.groupBy("event_type", "quartile").agg(
        F.count("*").alias("n_events"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (functions/bloom.py) — the fact table is
# map-side pre-filtered by a broadcast Bloom filter of the surviving dim
# keys BEFORE any shuffle. Superset + exact join ⇒ result-identical to the
# plain join, so the oracle IS the plain join — what the gate certifies is
# "pruning never loses a row"; pytest covers that it actually prunes.
# ---------------------------------------------------------------------------


@query(
    "bloom_prune_join",
    oracle="""
SELECT o.o_orderpriority,
       COUNT(*)::BIGINT AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice >= 450000
GROUP BY o.o_orderpriority
""",
)
def bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of line items belonging to high-value orders (~10% of
    orders survive the dim predicate), with the fact side Bloom-pruned
    before the join shuffle.

    100 TB shape: a plain join shuffles ALL of lineitem to drop ~90% of
    it at the join; here a ~O(keys·10 bits) filter built in one dim-side
    job is broadcast as a constant and evaluated AT THE SCAN, so only
    candidate rows (matches + ~1% false positives) enter the exchange.
    The filter is sized from a dim-side count (bloom_size_for, 1% fpp) —
    the same count a runtime-stats optimizer would have for free."""
    from vervectordb_spark.functions.bloom import (
        bloom_build,
        bloom_prune,
        bloom_size_for,
    )

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 450000)
        .select("o_orderkey", "o_orderpriority")
    )
    # the sizing count and the build are two actions over the same small
    # dim projection — cache across them, release before the main query
    # (which re-reads the dim once as the join build side)
    orders.persist()
    try:
        n_keys = orders.count()
        num_bits, num_hashes = bloom_size_for(max(n_keys, 1), fpp=0.01)
        bf = bloom_build(orders, "o_orderkey", num_bits, num_hashes)
    finally:
        orders.unpersist()

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast("decimal(18,2)")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(18,2)")
    )
    pruned = bloom_prune(li, "l_orderkey", bf)
    joined = pruned.join(
        orders, pruned.l_orderkey == orders.o_orderkey
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# time-series gap fill — dense hourly spine + zero-fill + forward fill.
# The fixture really is sparse (~5-7% of hours missing per event type).
# ---------------------------------------------------------------------------


@query(
    "events_gap_fill",
    oracle=f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {_US_PER_HOUR} AS hour_bucket, event_type,
         COUNT(*) AS n,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sv
  FROM events GROUP BY 1, 2
),
b AS (SELECT MIN(hour_bucket) AS lo, MAX(hour_bucket) AS hi FROM hourly),
spine AS (
  SELECT t.event_type, unnest(generate_series(b.lo, b.hi)) AS hour_bucket
  FROM (SELECT DISTINCT event_type FROM hourly) t, b
),
j AS (
  SELECT s.event_type, s.hour_bucket, h.n, h.sv
  FROM spine s LEFT JOIN hourly h USING (event_type, hour_bucket)
)
SELECT event_type, hour_bucket,
       COALESCE(n, 0)::BIGINT AS n_events,
       sv AS sum_value,
       last_value(sv IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour_bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       (n IS NULL) AS is_gap
FROM j
""",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type: missing hours materialized
    from an exploded sequence spine, counts zero-filled, the value
    forward-filled (last non-null — the standard sensor/metrics repair).

    Scale posture: the spine bounds come from a 1-row agg crossJoin (no
    driver collect); spine size = types × hours — a function of TIME
    RANGE and key cardinality, not event volume, so the left join's
    right side is the pre-aggregated hourly table (one shuffle) and the
    forward-fill window partitions by event_type over bounded per-type
    row counts. 100 TB of raw events still yields the same few-thousand-
    row spine."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.expr(f"ts div {_NS_PER_HOUR}").alias("hour_bucket"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.round(_dec_sum("value").cast("double"), 6).alias("sv"),
    )
    bounds = hourly.agg(
        F.min("hour_bucket").alias("lo"), F.max("hour_bucket").alias("hi")
    )
    types = hourly.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hour_bucket"),
    )
    j = spine.join(hourly, ["event_type", "hour_bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        "hour_bucket",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.col("sv").alias("sum_value"),
        F.last("sv", ignorenulls=True).over(w).alias("filled_value"),
        F.col("n").isNull().alias("is_gap"),
    )


# ---------------------------------------------------------------------------
# rolling z-score anomaly flags — exact-integer window statistics.
# Float portability: the window sums are INTEGER (event counts), so mean
# and variance are exact until two final double divisions; sqrt is
# IEEE-correctly-rounded on every engine. No float accumulation order
# ever matters — the trap a naive rolling mean of doubles would hit
# (DuckDB's sliding-window aggregation associates differently than
# Spark's running frame).
# ---------------------------------------------------------------------------


@query(
    "events_rolling_zscore",
    oracle=f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {_US_PER_HOUR} AS hour_bucket, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, hour_bucket, n,
         SUM(n) OVER w AS s,
         SUM(n * n) OVER w AS sq,
         COUNT(*) OVER w AS cnt
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
               RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT event_type, hour_bucket, n::BIGINT AS n_events,
       ROUND(s::DOUBLE / cnt, 6) AS mean24,
       ROUND(CASE WHEN sq * cnt = s * s THEN 0.0
             ELSE (n::DOUBLE - s::DOUBLE / cnt)
                  / sqrt((sq::DOUBLE * cnt - s::DOUBLE * s) / (cnt::DOUBLE * cnt))
             END, 6) + 0.0 AS zscore,
       (CASE WHEN sq * cnt = s * s THEN 0.0
        ELSE abs((n::DOUBLE - s::DOUBLE / cnt)
             / sqrt((sq::DOUBLE * cnt - s::DOUBLE * s) / (cnt::DOUBLE * cnt)))
        END) > 2.0 AS is_anomaly
FROM win
""",
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly event counts scored against their trailing 24-hour
    window: z = (x − mean)/σ over exact integer sums (population σ of
    the frame), |z| > 2 flagged. The frame is a RANGE over the integer
    hour bucket — a true 24-wall-clock-hour window whose count is the
    hours actually observed; a ROWS frame would silently stretch past an
    outage and score anomalies against a stale baseline exactly when
    detection matters most (the fixture is ~5-7% gappy). Sums/sumsq stay int64 (counts are
    small); the only floats are two divisions and one sqrt — all
    bit-portable, so the anomaly FLAGS cross the oracle gate, not just
    the rounded scores.

    Scale posture: the window runs over the pre-aggregated hourly table
    (rows = types × hours, independent of event volume), partitioned by
    event_type — never a global window."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        F.expr(f"ts div {_NS_PER_HOUR}").alias("hour_bucket"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_bucket")
        .rangeBetween(-23, 0)
    )
    s = F.sum("n").over(w)
    sq = F.sum(F.col("n") * F.col("n")).over(w)
    cnt = F.count("*").over(w)
    mean = s.cast("double") / cnt
    var = (sq.cast("double") * cnt - s.cast("double") * s) / (
        cnt.cast("double") * cnt
    )
    z = F.when(sq * cnt == s * s, F.lit(0.0)).otherwise(
        (F.col("n").cast("double") - mean) / F.sqrt(var)
    )
    return hourly.select(
        "event_type",
        "hour_bucket",
        F.col("n").cast("long").alias("n_events"),
        F.round(mean, 6).alias("mean24"),
        (F.round(z, 6) + 0.0).alias("zscore"),  # -0.0 canonicalized (queries_rotation.py note)
        (F.abs(z) > 2.0).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# events: incremental materialized rollup (continuous aggregate)
# ---------------------------------------------------------------------------

@query(
    "events_rollup_incremental",
    oracle=f"""
SELECT epoch_us(ts) // {_US_PER_HOUR} AS hour_bucket,
  event_type,
  COUNT(*) AS n_events,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_value,
  CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
  CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*), 6) AS avg_value,
  TRUE AS users_est_ok
FROM events
GROUP BY 1, 2
""",
)
def events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate invariant as a gated query: Spark answers
    from the MERGE of three per-batch partial rollups (events split by
    event_id % 3 — three separate "refresh" aggregations, then the
    associative combine, operators/rollup.py), DuckDB from one direct
    GROUP BY over everything. Counts, DECIMAL sums, min/max, and the
    derived avg must match exactly — order-independent partial states are
    what make refresh-without-history-rescan sound. The HLL
    distinct-users estimate (the one non-algebraic measure, carried as a
    mergeable sketch) is gated through its 3·rsd bound vs the exact
    per-group distinct, the queries_sketch.py pattern: a false anywhere
    breaks the hash."""
    from vervectordb_spark.operators import rollup

    ev = load_events(spark, sf_dir).withColumn(
        "hour_bucket", F.expr(f"ts div {_NS_PER_HOUR}")
    )
    keys = ["hour_bucket", "event_type"]
    parts = [
        rollup.partial_rollup(
            ev.filter(F.col("event_id") % 3 == i), keys, "value",
            distinct_col="user_id",
        )
        for i in range(3)
    ]
    merged = rollup.merge_rollup(
        parts[0].unionByName(parts[1]).unionByName(parts[2]), keys
    )
    fin = rollup.finalize_rollup(merged)
    exact = ev.groupBy(*keys).agg(
        F.countDistinct("user_id").alias("_exact_users")
    )
    rsd = 1.04 / (2 ** (12 / 2.0))  # lgK=12 -> ~1.6%
    return fin.join(exact, keys).select(
        "hour_bucket",
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("sum_v").cast("double"), 6).alias("sum_value"),
        F.col("min_v").cast("double").alias("min_value"),
        F.col("max_v").cast("double").alias("max_value"),
        F.round("avg_v", 6).alias("avg_value"),
        (
            F.abs(F.col("n_distinct_est") - F.col("_exact_users"))
            <= 3.0 * rsd * F.col("_exact_users") + 1.0
        ).alias("users_est_ok"),
    )
