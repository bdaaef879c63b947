"""TPC-H-shaped relational breadth (beyond the reference surface).

The reference has no relational layer at all (SURVEY.md §2.6); these are
the classic decision-support shapes a user of a 100 TB corpus store runs
next to the vector queries, adapted to the driver fixtures (which lack
l_commitdate / l_receiptdate / partsupp — filters are re-targeted onto the
columns that exist, keeping each query's OPERATOR shape intact):

  tpch_shipping_priority       Q3  — 3-way join, grouped revenue, top-N
  tpch_order_priority          Q4  — EXISTS semi-join + priority counts
  tpch_volume_shipping         Q7  — nation×nation self-join aliasing
  tpch_returned_items          Q10 — returned-revenue per customer, top-N
  tpch_promo_revenue           Q14 — conditional-aggregate revenue share
  tpch_large_volume_customers  Q18 — HAVING on a pre-aggregated fact
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
