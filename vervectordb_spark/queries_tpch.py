"""TPC-H-shaped relational breadth (beyond the reference surface).

The reference has no relational layer at all (SURVEY.md §2.6); these are
the classic decision-support shapes a user of a 100 TB corpus store runs
next to the vector queries, adapted to the driver fixtures (which lack
l_commitdate / l_receiptdate / partsupp — filters are re-targeted onto the
columns that exist, keeping each query's OPERATOR shape intact):

  tpch_min_cost_supplier       Q2  — correlated MIN over a region, decorrelated
  tpch_shipping_priority       Q3  — 3-way join, grouped revenue, top-N
  tpch_order_priority          Q4  — EXISTS semi-join + priority counts
  tpch_local_supplier_volume   Q5  — 6-way join, intra-nation condition
  tpch_forecast_revenue        Q6  — single-scan filtered aggregate
  tpch_volume_shipping         Q7  — nation×nation self-join aliasing
  tpch_market_share            Q8  — per-year conditional share over 7 joins
  tpch_product_type_profit     Q9  — 5-way join profit by (nation, year)
  tpch_returned_items          Q10 — returned-revenue per customer, top-N
  tpch_important_stock         Q11 — group value vs global-total threshold
  tpch_late_shipment_priority  Q12 — conditional two-way counts per class
  tpch_customer_distribution   Q13 — outer join + double aggregation
  tpch_promo_revenue           Q14 — conditional-aggregate revenue share
  tpch_top_supplier            Q15 — agg view + global-max scalar equality
  tpch_small_qty_revenue       Q17 — correlated per-part avg, decorrelated
  tpch_parts_supplier_counts   Q16 — distinct-count over a bridge join
  tpch_large_volume_customers  Q18 — HAVING on a pre-aggregated fact
  tpch_discounted_revenue      Q19 — OR-of-ANDs join predicate branches
  tpch_dominant_suppliers      Q20 — two-level share-of-total ratio
  tpch_waiting_suppliers       Q21 — EXISTS + NOT EXISTS self-join, decorrelated
  tpch_top_acctbal_no_orders   Q22 — global-avg scalar subquery + anti-join

Money arithmetic follows the module contract in queries_relational.py:
per-value DECIMAL casts, exact decimal products/sums, double only at the
end — so every float is bit-identical to the DuckDB twin.

Scale posture: only bounded dims (nation) are broadcast-hinted; customer /
orders / lineitem take shuffle joins (AQE upgrades small sides at
runtime). Pre-aggregation runs BEFORE fact-fact joins wherever the group
key is the join key (Q3, Q18), so the shuffle carries groups, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vervectordb_spark.queries import query
from vervectordb_spark.schema import load_table


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def _revenue_col() -> F.Column:
    """Exact decimal l_extendedprice · (1 − l_discount)."""
    one = F.lit(1).cast("decimal(18,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount"))


#: DuckDB twin of _revenue_col — identical decimal arithmetic
_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


# ---------------------------------------------------------------------------
# Q3 — shipping priority: revenue of undelivered orders for one segment
# ---------------------------------------------------------------------------

@query(
    "tpch_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey, o.o_orderdate,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
""",
)
def tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. lineitem is pre-filtered on the pushed shipdate
    predicate and pre-aggregated per orderkey BEFORE joining orders (the
    group key IS the join key, so the join input is |orders|, not
    |lineitem|); customer acts as a semi-filter on the segment. Top-10 via
    orderBy().limit() → TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li_agg = li.groupBy("l_orderkey").agg(
        F.sum(_revenue_col()).alias("_rev")
    )
    joined = (
        li_agg.join(orders, li_agg.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey"))
    )
    return (
        joined.select(
            "l_orderkey",
            "o_orderdate",
            F.col("_rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS semi-join
# ---------------------------------------------------------------------------

@query(
    "tpch_order_priority",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o.o_orderpriority
""",
)
def tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS re-targeted onto l_returnflag — the fixtures
    carry no commit/receipt dates). left_semi join: the probe side never
    widens, and the returnflag filter is pushed into the lineitem scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping: nation self-join aliasing (supp nation ≠ cust nation)
# ---------------------------------------------------------------------------

@query(
    "tpch_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND n1.n_name IN ('FRANCE', 'GERMANY', 'CHINA', 'BRAZIL')
GROUP BY n1.n_name, n2.n_name
""",
)
def tpch_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the SAME bounded dim (nation) joined twice under two
    aliases — supplier's nation vs customer's nation — both broadcast. The
    fact-fact lineitem⋈orders shuffle runs once; everything else is
    broadcast hash joins."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("_n1_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("FRANCE", "GERMANY", "CHINA", "BRAZIL"))
    n2 = nat.select(
        F.col("n_nationkey").alias("_n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("_n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("_n2_key"))
        .filter(F.col("_n1_key") != F.col("_n2_key"))
    )
    return joined.groupBy("supp_nation", "cust_nation").agg(
        F.sum(_revenue_col()).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item report: top customers by returned revenue
# ---------------------------------------------------------------------------

@query(
    "tpch_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name AS nation,
  CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
)
def tpch_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue this half-year.
    Returned lineitems pre-aggregate per orderkey before the orders join;
    nation broadcasts; top-20 via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    li_agg = li.groupBy("l_orderkey").agg(F.sum(_revenue_col()).alias("_rev"))
    joined = (
        li_agg.join(orders, li_agg.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum("_rev").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue share: conditional aggregate over a part-type join
# ---------------------------------------------------------------------------

@query(
    "tpch_promo_revenue",
    oracle=f"""
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL}
                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS promo_share_pct,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
""",
)
def tpch_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO-type parts in a
    quarter. part scales with SF → shuffle join (AQE may upgrade); both
    sums are exact decimals, ONE double division at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,2)")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", _revenue_col()).otherwise(zero)
            ).cast("double")
            / F.sum(_revenue_col()).cast("double"),
            6,
        ).alias("promo_share_pct"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: HAVING over a pre-aggregated fact
# ---------------------------------------------------------------------------

@query(
    "tpch_large_volume_customers",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       b.sum_qty
FROM big b
JOIN orders o   ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def tpch_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 300. The HAVING
    aggregate runs FIRST (shuffle carries one row per orderkey), and only
    the surviving handful of orderkeys join orders/customer."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > F.lit(300).cast("decimal(18,2)"))
        .select("l_orderkey", F.col("_sq").cast("double").alias("sum_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — wealthy inactive customers: scalar subquery + anti-join
# ---------------------------------------------------------------------------

@query(
    "tpch_top_acctbal_no_orders",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_nationkey, COUNT(*) AS numcust,
  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_nationkey
""",
)
def tpch_top_acctbal_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never ordered.
    The global average is a 1-row aggregate crossJoined in (house style —
    no driver collect, no global window); the no-orders test is a
    left_anti join on the DISTINCT custkeys of orders (the anti side
    shuffles |customers| once; distinct pre-shrinks the build side)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("_a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: revenue kept inside each ASIA nation
# ---------------------------------------------------------------------------

@query(
    "tpch_local_supplier_volume",
    oracle=f"""
SELECT n.n_name AS nation, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
""",
)
def tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue shipped by a supplier to a customer of the
    SAME nation, per ASIA nation. nation⋈region collapses to a 5-row
    broadcast dim; supplier and customer each carry their nationkey through
    the fact joins, and the intra-nation condition is applied as a join
    condition (not a post-filter) so the planner can use it. customer /
    orders / lineitem / supplier scale with SF → shuffle joins, AQE
    upgrades small sides at runtime."""
    asia_nat = (
        load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", F.col("n_name").alias("nation"))
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
    )
    return joined.groupBy("nation").agg(
        F.sum(_revenue_col()).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: single-scan filtered aggregate
# ---------------------------------------------------------------------------

@query(
    "tpch_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
""",
)
def tpch_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical single-scan query — every predicate
    (shipdate range, discount band, quantity cap) must reach the parquet
    scan as a pushed filter, and the whole plan is scan → partial agg →
    1-row final agg. No joins, no wide shuffle; the 100 TB cost is exactly
    one pruned column scan. Plan-audited in tests/test_plans.py."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: conditional share over the full star
# ---------------------------------------------------------------------------

@query(
    "tpch_market_share",
    oracle=f"""
SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INT) AS o_year,
  ROUND(CAST(SUM(CASE WHEN n2.n_name = 'BRAZIL' THEN {_REV_SQL}
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS mkt_share,
  COUNT(*) AS n_lineitems
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
GROUP BY o_year
""",
)
def tpch_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: BRAZIL's share of AMERICA-bound ECONOMY-part revenue
    per order year. Seven joins: the two nation aliases + region are
    bounded broadcast dims; part/supplier/orders/customer/lineitem all
    scale with SF and take shuffle joins. Both sums stay exact decimal;
    one double division per group at the end."""
    nat = load_table(spark, sf_dir, "nation")
    amer = (
        nat.join(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("_cn_key"))
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("_sn_key"), F.col("n_name").alias("_supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(amer), cust.c_nationkey == F.col("_cn_key"))
        .join(F.broadcast(n2), supp.s_nationkey == F.col("_sn_key"))
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("_supp_nation") == "BRAZIL", _revenue_col()).otherwise(zero)
            ).cast("double")
            / F.sum(_revenue_col()).cast("double"),
            6,
        ).alias("mkt_share"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join + double aggregation
# ---------------------------------------------------------------------------

@query(
    "tpch_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
)
def tpch_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, … non-urgent
    orders. Instead of outer-joining raw orders rows (|orders| shuffle)
    then counting, orders pre-aggregates per custkey FIRST (shuffle
    carries one row per customer), then a left join + coalesce(0) keeps
    the order-less customers the outer join exists for. The second
    aggregation groups on the tiny distinct-count domain."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("_n"))
    )
    counts = (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate view + global-max scalar equality
# ---------------------------------------------------------------------------

@query(
    "tpch_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM supplier s
JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s.s_suppkey
""",
)
def tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the max quarterly revenue.
    The revenue view aggregates once and is reused for both the per-key
    rows and the global max — the max arrives as a broadcast 1-row
    aggregate crossJoined in (house style: no driver collect, no global
    window), and the equality filter keeps exact decimals so ties are
    bit-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue_col()).alias("_total_rev"))
    max_rev = rev.agg(F.max("_total_rev").alias("_max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("_total_rev") == F.col("_max_rev"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.col("_total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated per-part avg, decorrelated
# ---------------------------------------------------------------------------

@query(
    "tpch_small_qty_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly,
  COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23' AND p.p_type = 'MEDIUM'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = p.p_partkey
  )
""",
)
def tpch_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost if below-one-fifth-of-average-quantity
    orders stopped. The correlated scalar subquery is decorrelated by hand
    into ONE per-partkey average aggregate joined back to the fact — the
    same rewrite Catalyst/DuckDB apply, made explicit so the shuffle
    carries one row per part, not a re-scan per outer row. The average is
    over ALL lineitems of the part (not just the brand's), matching the
    oracle's subquery scope; the brand filter prunes via a broadcast-able
    filtered part dim before both the avg and the final join."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    # per-part avg over all lineitems, restricted to surviving parts first
    avg_qty = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("_qty_cap"))
        .withColumnRenamed("l_partkey", "_avg_partkey")
    )
    joined = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .join(avg_qty, F.col("l_partkey") == F.col("_avg_partkey"))
        .filter(F.col("l_quantity") < F.col("_qty_cap"))
    )
    return joined.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
        .cast("double")
        .alias("avg_yearly"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: OR-of-ANDs predicate across join branches
# ---------------------------------------------------------------------------

@query(
    "tpch_discounted_revenue",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def tpch_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd brand/size/quantity windows over the
    part join. The disjunction mixes columns from both sides, so it can't
    fully push to either scan — but each side's derivable envelope CAN:
    part pre-filters to the union of the three brands, lineitem to the
    quantity hull [1, 30], shrinking the join inputs before the residual
    OR applies. Catalyst derives some of this; the explicit envelope
    filters make it unconditional."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1.0) & (F.col("l_quantity") <= 30.0)
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1.0) & (F.col("l_quantity") <= 11.0)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10.0) & (F.col("l_quantity") <= 20.0)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20.0) & (F.col("l_quantity") <= 30.0)
        )
    )
    joined = li.join(part, li.l_partkey == part.p_partkey).filter(branch)
    return joined.agg(
        F.sum(_revenue_col()).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS, decorrelated
# ---------------------------------------------------------------------------

@query(
    "tpch_waiting_suppliers",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
""",
)
def tpch_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (re-targeted onto l_returnflag — no receipt/commit
    dates in the fixtures): suppliers who were the ONLY returner on a
    multi-supplier finalized order. The correlated EXISTS / NOT EXISTS
    pair decorrelates into ONE per-orderkey aggregate — distinct supplier
    count and distinct returning-supplier count — joined back to the
    candidate rows; l1 qualifies iff the order has another supplier
    (n_supp > 1) and no OTHER returner (n_ret_supp = 1, and l1 is it).
    One lineitem shuffle for the aggregate, one broadcast-able join back;
    no per-row re-scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    ord_stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_ret_supp"),
    ).filter((F.col("_n_supp") > 1) & (F.col("_n_ret_supp") == 1))
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    cand = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey, "left_semi")
        .join(
            ord_stats.select("l_orderkey"),
            on="l_orderkey",
            how="left_semi",
        )
    )
    return (
        cand.join(supp, cand.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship: distinct-supplier counts per part attrs
# ---------------------------------------------------------------------------

@query(
    "tpch_parts_supplier_counts",
    oracle="""
SELECT p.p_type, p.p_size, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p.p_type, p.p_size
""",
)
def tpch_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (partsupp replaced by the lineitem bridge — the
    fixtures carry no partsupp table): how many distinct suppliers ship
    each (type, size) bucket, excluding one brand. The distinct aggregate
    runs on (type, size, suppkey) triples — Spark expands to a two-phase
    distinct agg so the shuffle carries distinct triples, not lineitems."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — dominant suppliers: share-of-part-volume ratio over two agg levels
# ---------------------------------------------------------------------------

@query(
    "tpch_dominant_suppliers",
    oracle="""
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey,
    SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_type = 'PROMO'
  GROUP BY l.l_partkey, l.l_suppkey
),
tot AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty FROM ps GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_dominated_parts
FROM ps
JOIN tot      ON ps.l_partkey = tot.l_partkey
JOIN supplier s ON ps.l_suppkey = s.s_suppkey
WHERE ps.supp_qty > CAST(0.15 AS DECIMAL(18,2)) * tot.part_qty
GROUP BY s.s_suppkey, s.s_name
ORDER BY n_dominated_parts DESC, s.s_suppkey
LIMIT 20
""",
)
def tpch_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (the available-quantity test re-targeted from
    partsupp onto shipped volume): suppliers carrying an outsized
    share (>15%) of a PROMO part's total shipped quantity. Two aggregation levels share one
    lineitem scan lineage — the per-(part, supplier) rollup feeds the
    per-part total (shuffle carries (part, supplier) groups, then part
    groups), and the share test is an exact decimal comparison, so ties
    at exactly the cut resolve identically on both engines."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("_supp_qty"))
    )
    tot = ps.groupBy("l_partkey").agg(F.sum("_supp_qty").alias("_part_qty"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    share_cut = F.lit(0.15).cast("decimal(18,2)")
    return (
        ps.join(tot, on="l_partkey")
        .filter(F.col("_supp_qty") > share_cut * F.col("_part_qty"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_dominated_parts"))
        .orderBy(F.desc("n_dominated_parts"), F.asc("s_suppkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated MIN subquery over a region
# ---------------------------------------------------------------------------

@query(
    "tpch_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_type,
       CAST(c.supply_cost AS DOUBLE) AS supply_cost
FROM part p
JOIN cost c ON c.l_partkey = p.p_partkey
JOIN eu e   ON e.s_suppkey = c.l_suppkey
WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
  AND c.supply_cost = (
    SELECT MIN(c2.supply_cost) FROM cost c2
    JOIN eu e2 ON e2.s_suppkey = c2.l_suppkey
    WHERE c2.l_partkey = p.p_partkey
  )
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
LIMIT 100
""",
)
def tpch_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp re-targeted onto observed lineitem unit
    cost): for each small LARGE-type part, the EUROPE supplier(s) offering
    the minimum cost. The correlated MIN subquery is decorrelated into one
    per-part MIN over the region-restricted cost table, joined back on
    (part, exact-decimal cost equality) — the same rewrite both optimizers
    apply, made explicit so each aggregation shuffles once on its group
    key. nation/region are bounded dims (25/5 rows) and broadcast; the
    supplier join stays a shuffle join (supplier scales with SF) that AQE
    upgrades at runtime when small."""
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("_supply_cost")
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_cost = cost.join(
        eu, cost.l_suppkey == eu.s_suppkey
    )
    min_cost = eu_cost.groupBy("l_partkey").agg(
        F.min("_supply_cost").alias("_min_cost")
    ).withColumnRenamed("l_partkey", "_min_partkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_type")
    return (
        eu_cost.join(min_cost, F.col("l_partkey") == F.col("_min_partkey"))
        .filter(F.col("_supply_cost") == F.col("_min_cost"))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
            F.col("_supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit: 5-way join grouped by (nation, year)
# ---------------------------------------------------------------------------

@query(
    "tpch_product_type_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       EXTRACT(year FROM o.o_orderdate) AS o_year,
       CAST(SUM({_REV_SQL}
                - CAST(l.l_tax AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)
ORDER BY nation, o_year DESC
""",
)
def tpch_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (ps_supplycost re-targeted onto the tax-per-unit
    columns that exist): profit per supplier-nation per order-year for
    parts matching a name pattern. Five joins, but only ONE is fact-fact
    (lineitem ⋈ orders on orderkey): part is pre-filtered by the LIKE
    before joining (semi-filter prunes the fact early), supplier→nation
    resolves the group key, and nation is broadcast. Profit is exact
    decimal end-to-end — both products are dec(18,2)×dec(18,2) at scale 4,
    so the subtraction and sum are order-independent and bit-identical to
    the DuckDB twin."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").join(
        part, F.col("l_partkey") == part.p_partkey, "left_semi"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _revenue_col() - _dec("l_tax") * _dec("l_quantity")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: group value vs a global-total threshold
# ---------------------------------------------------------------------------

@query(
    "tpch_important_stock",
    oracle="""
WITH val AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(l.l_quantity AS DECIMAL(18,2))) AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_13', 'NATION_18')
  GROUP BY l.l_partkey
)
SELECT v.l_partkey AS p_partkey, CAST(v.part_value AS DOUBLE) AS stock_value
FROM val v
CROSS JOIN (SELECT SUM(part_value) AS total_value FROM val) t
WHERE CAST(v.part_value AS DOUBLE) > CAST(t.total_value AS DOUBLE) / 500.0
ORDER BY stock_value DESC, p_partkey
""",
)
def tpch_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp availqty·supplycost re-targeted onto
    shipped value): parts whose value held by two nations' suppliers
    exceeds a fraction of the global total. The global scalar arrives as a
    broadcast 1-row aggregate crossJoined in (house style — no driver
    collect, no global window); the threshold comparison is done in
    double on BOTH engines (same cast, same division) so the cut is
    bit-identical. The value table aggregates once and feeds both sides."""
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_13", "NATION_18")
    ).select("n_nationkey")
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey, "left_semi"
    ).select("s_suppkey")
    li = load_table(spark, sf_dir, "lineitem")
    val = (
        li.join(supp, li.l_suppkey == supp.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("_value"))
    )
    total = val.agg(F.sum("_value").alias("_total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(
            F.col("_value").cast("double")
            > F.col("_total").cast("double") / F.lit(500.0)
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("_value").cast("double").alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — late shipments by priority class: conditional two-way counts
# ---------------------------------------------------------------------------

@query(
    "tpch_late_shipment_priority",
    oracle="""
SELECT l.l_returnflag AS return_flag,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY l.l_returnflag
ORDER BY return_flag
""",
)
def tpch_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_shipmode/commitdate re-targeted onto returnflag
    and ship-lateness): per return class, how many late-shipped lineitems
    belonged to high- vs low-priority orders. One fact-fact join on
    orderkey with the lateness predicate evaluated join-side (no
    pre-filter is possible — it spans both tables), then a 3-group
    conditional aggregate; the CASE pair is one pass, not two scans."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("return_flag")
    )
