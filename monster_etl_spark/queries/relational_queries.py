"""Relational analytics surface: aggregation, joins, windows, rollup,
semi/anti joins, as-of join.

The reference implements none of these (SURVEY.md §2.3-2.5) — they are the
capabilities Spark SQL contributes natively; these queries pin their
semantics against DuckDB and define the performance surface ``bench.py``
measures.

Plan-shape notes (verified via .explain; see tests/test_plans.py):
- dimension joins broadcast (region/nation/customer-side small tables);
- aggregates run partial (map-side) before the key exchange;
- parquet scans carry PushedFilters + pruned ReadSchema for every filter
  and projection here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monster_etl_spark.queries import QuerySpec, load

# exact-sum discipline: double -> decimal -> sum (exact) -> one double cast
DEC_PRICE = "decimal(12,2)"
DEC_RATE = "decimal(8,4)"


def _p(c: str) -> F.Column:
    return F.col(c).cast(DEC_PRICE)


def _r(c: str) -> F.Column:
    return F.col(c).cast(DEC_RATE)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate on the fact table.

    The partial aggregation is the heavy term (8 decimal sums over every
    row) and the test corpus is a single parquet row group, so without a
    spread it runs SERIALLY inside the scan task (measured: one 0.99 s
    task at sf0.1 — round-11, guide §2.6 stragglers). ``spread`` is a
    no-op at scale and safe here because every aggregate is an exact
    decimal sum or a count — partition order cannot change any value."""
    from monster_etl_spark.operators.partitioning import spread

    l = spread(
        load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
    )
    one = F.lit(1).cast(DEC_RATE)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_p("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_p("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_p("l_extendedprice") * (one - _r("l_discount"))).cast("double").alias("sum_disc_price"),
            # sum_charge needs three layers of care: (a) the scale-10 sum's
            # unscaled value exceeds 2^53 where Spark's decimal->double cast
            # double-rounds; (b) raw DECIMAL output reaches pandas as object
            # (Spark) vs float64 (DuckDB); (c) decimal RESCALING diverges on
            # exact ties (Spark HALF_UP vs DuckDB half-even). So: explicit
            # integer-space HALF_UP (floor(x*10^4 + 0.5), exact decimal ops,
            # positive values), exact integral sum, one double conversion.
            (
                F.sum(
                    F.floor(
                        (_p("l_extendedprice") * (one - _r("l_discount")) * (one + _r("l_tax")))
                        * 10000
                        + F.lit(0.5).cast("decimal(2,1)")
                    )
                ).cast("double")
                / F.lit(10000.0)
            ).alias("sum_charge"),
            (F.sum(_p("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_p("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(floor(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4))) AS DECIMAL(26,10)) * 10000 + CAST(0.5 AS DECIMAL(2,1)))) AS DOUBLE) / 10000.0 AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact joins -> agg -> top-k.
    customer/orders filters push to the scans; the final top-10 is a global
    sort of an already-small aggregate. customer grows with SF, so no
    forced broadcast — AQE/autoBroadcastJoinThreshold picks the strategy
    (broadcast at small SF, shuffle-hash at 100 TB)."""
    cutoff = "1997-06-01"
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(cutoff))
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(cutoff))
    one = F.lit(1).cast(DEC_RATE)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_p("l_extendedprice") * (one - _r("l_discount"))).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through region->nation with the
    customer-and-supplier-same-nation constraint. Only the bounded dims
    (region: 5 rows, nation: 25 rows) are force-broadcast; customer and
    supplier grow with SF, so their join strategy is left to
    AQE/autoBroadcastJoinThreshold — a forced broadcast would OOM at
    the 100 TB target."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(DEC_RATE)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_p("l_extendedprice") * (one - _r("l_discount"))).cast("double").alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price — window ranking with a
    deterministic key tiebreak; single shuffle on the partition key."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q_WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order value + previous order gap — frame-based
    window functions (rows-unbounded-preceding sum, lag)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_p("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
    )


Q_RUNNING_TOTAL_SQL = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
  lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregation (status x priority hierarchy)."""
    from monster_etl_spark.operators.partitioning import spread

    # spread: the rollup's partial aggregation (exact decimal sums +
    # counts) otherwise runs serially in the single-split orders scan
    # task (round-11, guide §2.6; no-op at scale)
    o = spread(load(spark, sf_dir, "orders"))
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_p("o_totalprice")).cast("double").alias("total_value"),
        )
    )


Q_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders — left-anti join (broadcast threshold
    decides build side; at scale the orders side pre-aggregates to distinct
    keys before the join, which Catalyst does via the semi-join rewrite)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


Q_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one urgent open order — left-semi join."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") == "1-URGENT")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


Q_SEMI_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O' AND o_orderpriority = '1-URGENT')
"""


def q_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order of the same user at or
    before the event time (plus how many came before). Expressed as a range
    join + aggregate; at 100 TB the same semantics run as a
    range-partitioned merge (sort both sides on (key, time) and take a
    running last over the union) rather than an expanding inequality join."""
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    joined = e.join(
        o,
        (e.user_id == o.o_custkey) & (o.o_orderdate <= e.ts),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.max("o_orderdate").alias("last_order_date"),
        F.count("o_orderkey").alias("n_orders_before"),
    )


Q_ASOF_SQL = """
SELECT event_id, user_id, MAX(o_orderdate) AS last_order_date, COUNT(o_orderkey) AS n_orders_before
FROM events
LEFT JOIN orders ON user_id = o_custkey AND o_orderdate <= ts
GROUP BY event_id, user_id
"""


QUERIES = {
    "q1_pricing_summary": QuerySpec(q1_pricing_summary, Q1_SQL, "TPC-H Q1 scan+agg"),
    "q3_shipping_priority": QuerySpec(q3_shipping_priority, Q3_SQL, "TPC-H Q3 join+agg+topk"),
    "q5_local_supplier_volume": QuerySpec(q5_local_supplier_volume, Q5_SQL, "TPC-H Q5 star join"),
    "q_window_topk": QuerySpec(q_window_topk, Q_WINDOW_TOPK_SQL, "window ranking"),
    "q_running_total": QuerySpec(q_running_total, Q_RUNNING_TOTAL_SQL, "window frames + lag"),
    "q_rollup": QuerySpec(q_rollup, Q_ROLLUP_SQL, "rollup grouping sets"),
    "q_anti_join": QuerySpec(q_anti_join, Q_ANTI_SQL, "left-anti join"),
    "q_semi_join": QuerySpec(q_semi_join, Q_SEMI_SQL, "left-semi join"),
    "q_asof_last_order": QuerySpec(q_asof_last_order, Q_ASOF_SQL, "as-of range join"),
}


def q_asof_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of semantics as q_asof_last_order, executed as the
    range-partitioned merge (operators/joins.py::asof_join_merge): tag
    both sides, union, one running last/count per key — |L| + |R| rows
    through one shuffle instead of the inequality join's |matches|
    expansion. Sharing q_asof_last_order's oracle pins that the two
    physical strategies are value-identical; at fact-fact scale this is
    the one that survives."""
    from monster_etl_spark.operators.joins import asof_join_merge

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    e = load(spark, sf_dir, "events")
    merged = asof_join_merge(
        e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        value_cols=["o_orderdate"], count_col="n_orders_before",
    )
    return merged.select(
        "event_id", "user_id",
        F.col("o_orderdate").alias("last_order_date"),
        "n_orders_before",
    )


QUERIES["q_asof_merge_join"] = QuerySpec(
    q_asof_merge_join, Q_ASOF_SQL, "as-of join via range-partitioned merge (same oracle as the range-join form)"
)
