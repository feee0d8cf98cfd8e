"""Additional TPC-H-shaped queries adapted to the testdata star schema
(no partsupp table and fewer columns than stock TPC-H, so these keep the
*plan shapes* — exists-with-range, case-counting, left-join distributions,
conditional shares, avg-subquery anti-patterns, having-filtered IN — on the
columns that exist)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monster_etl_spark.queries import QuerySpec, load

DEC_P = "decimal(12,2)"
DEC_R = "decimal(8,4)"


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS-correlated range filter -> priority distribution."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01")) & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


def q12_shipmode_case_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join + CASE-bucketed counting (high/low priority split)."""
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    high = F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= 30
GROUP BY l_returnflag
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left-join count per customer, then distribution of the
    counts (two-level aggregation)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: conditional revenue share (promo parts / all parts).
    part is SF-proportional — join strategy left to AQE, no forced
    broadcast."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01")) & (F.col("l_shipdate") < F.lit("1997-07-01"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DEC_P) * (F.lit(1).cast(DEC_R) - F.col("l_discount").cast(DEC_R))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC_P))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias("promo_share_pct")
        )
    )


Q14_SQL = """
SELECT 100.0
  * CAST(SUM(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
  AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: per-key average subquery as a filter (rows below 50% of
    their part's average quantity). Catalyst rewrites the correlated
    aggregate into a join against the pre-aggregated averages."""
    l = load(spark, sf_dir, "lineitem")
    avg_qty = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast(DEC_P)).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        l.join(avg_qty, l.l_partkey == avg_qty.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC_P)).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


Q17_SQL = """
WITH avgs AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem JOIN avgs ON l_partkey = pk
WHERE l_quantity < 0.5 * avg_qty
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-filtered keys feed an IN over the join (big-order
    customers). customer is SF-proportional, so no forced broadcast —
    AQE decides (and at small SF still picks broadcast on its own)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC_P)).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES = {
    "q4_order_priority": QuerySpec(q4_order_priority, Q4_SQL, "Q4: EXISTS range filter"),
    "q12_shipmode_case_count": QuerySpec(q12_shipmode_case_count, Q12_SQL, "Q12: CASE-bucketed counts"),
    "q13_customer_distribution": QuerySpec(q13_customer_distribution, Q13_SQL, "Q13: count-of-counts distribution"),
    "q14_promo_share": QuerySpec(q14_promo_share, Q14_SQL, "Q14: conditional revenue share"),
    "q17_small_quantity_revenue": QuerySpec(q17_small_quantity_revenue, Q17_SQL, "Q17: avg-subquery filter"),
    "q18_large_orders": QuerySpec(q18_large_orders, Q18_SQL, "Q18: HAVING-fed join"),
}
