"""TPC-H shapes that need the ``partsupp`` table (Q2/Q9/Q11/Q15/Q16/Q20).

The driver testdata has no partsupp parquet, so both engines derive an
identical one from ``part`` x ``supplier`` with dbgen's supplier-assignment
formula (4 suppliers per part,
``suppkey = (partkey + i*(S/4 + (partkey-1)/S)) % S + 1``) and deterministic
integer-arithmetic ``ps_availqty`` / ``ps_supplycost``. All arithmetic is
integer (or an integer divided by 100, which both engines evaluate to the
same IEEE double), so the Spark and DuckDB partsupp rows are bit-identical
and every downstream query hash-matches.

Scale posture: partsupp is 4x |part| rows built with a narrow projection +
a 4-element explode — no shuffle; the singleton supplier count joins as a
1-row broadcast. Downstream joins follow the round-1 verdict rule:
broadcast only bounded dims (region/nation, 1-row scalars); SF-growing
tables (supplier, part, partsupp, lineitem) go through AQE-planned shuffle
joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monster_etl_spark.queries import QuerySpec, load

DEC_P = "decimal(12,2)"
DEC_R = "decimal(8,4)"

# Exact decimal revenue term shared by Q9/Q15 (same idiom as tpch_queries).
_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: 4 suppliers per part via the dbgen formula."""
    part = load(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("s_cnt"))
    return (
        part.join(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
            "s_cnt",
        )
        .withColumn(
            "ps_suppkey",
            F.expr(
                "CAST((ps_partkey + i * ((s_cnt div 4) + ((ps_partkey - 1) div s_cnt)))"
                " % s_cnt + 1 AS BIGINT)"
            ),
        )
        .withColumn(
            "ps_availqty", F.expr("CAST((ps_partkey * 31 + ps_suppkey * 7) % 9999 + 1 AS INT)")
        )
        .withColumn(
            "ps_supplycost",
            F.expr("CAST((ps_partkey * 17 + ps_suppkey * 13) % 9000 AS DOUBLE) / 100.0 + 1.0"),
        )
        .drop("i", "s_cnt")
    )


# DuckDB twin of derived_partsupp — prepended to every oracle below.
PS_CTE = """
WITH ps0 AS (
  SELECT p_partkey AS ps_partkey,
         CAST((p_partkey + i.i * ((s.s_cnt // 4) + ((p_partkey - 1) // s.s_cnt))) % s.s_cnt + 1 AS BIGINT) AS ps_suppkey
  FROM part
  CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) i
  CROSS JOIN (SELECT COUNT(*) AS s_cnt FROM supplier) s
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST((ps_partkey * 31 + ps_suppkey * 7) % 9999 + 1 AS INT) AS ps_availqty,
         CAST((ps_partkey * 17 + ps_suppkey * 13) % 9000 AS DOUBLE) / 100.0 + 1.0 AS ps_supplycost
  FROM ps0
)"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: min-cost supplier per part within a region (correlated MIN
    subquery rewritten as agg + equality join back). Region/nation are the
    only broadcasts; supplier/partsupp shuffle-join under AQE."""
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_sup = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    costs = ps.join(eur_sup, ps.ps_suppkey == F.col("s_suppkey")).select(
        "ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name"
    )
    minc = costs.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    return (
        p.join(costs, p.p_partkey == costs.ps_partkey)
        .join(minc, (F.col("ps_partkey") == F.col("mk")) & (F.col("ps_supplycost") == F.col("min_cost")))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost")
    )


Q2_SQL = PS_CTE + """,
eur AS (
  SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
minc AS (SELECT ps_partkey AS mk, MIN(ps_supplycost) AS min_cost FROM eur GROUP BY ps_partkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
FROM part
JOIN eur ON p_partkey = ps_partkey
JOIN minc ON ps_partkey = mk AND ps_supplycost = min_cost
WHERE p_size = 15 AND p_type = 'LARGE'
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit (revenue minus supply cost) per nation per year —
    the 6-table join. partsupp joins lineitem on the composite
    (partkey, suppkey) key exactly as stock TPC-H does."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice").cast(DEC_P) * (
        F.lit(1).cast(DEC_R) - F.col("l_discount").cast(DEC_R)
    )
    cost = (F.col("ps_supplycost") * F.col("l_quantity")).cast("decimal(18,2)")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(ps, (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
    )


Q9_SQL = PS_CTE + f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_REV} - CAST(ps_supplycost * l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part inventory value for one nation's suppliers,
    HAVING > fraction-of-total (scalar subquery as a 1-row broadcast).
    ps_supplycost*ps_availqty is an exact 2-dp rational, so the DECIMAL
    cast recovers it exactly in both engines."""
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    val = (F.col("ps_supplycost") * F.col("ps_availqty")).cast("decimal(18,2)")
    per_part = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(val).alias("dec_value"))
    )
    total = per_part.agg((F.sum("dec_value").cast("double") * F.lit(0.002)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("dec_value").cast("double") > F.col("threshold"))
        .select("ps_partkey", F.col("dec_value").cast("double").alias("value"))
    )


Q11_SQL = PS_CTE + """,
per_part AS (
  SELECT ps_partkey, SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,2))) AS dec_value
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY ps_partkey
)
SELECT ps_partkey, CAST(dec_value AS DOUBLE) AS value
FROM per_part
WHERE CAST(dec_value AS DOUBLE) > (SELECT CAST(SUM(dec_value) AS DOUBLE) * 0.002 FROM per_part)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view per supplier over a quarter, then the
    supplier(s) achieving MAX revenue (ties kept, like the spec)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    rev = F.col("l_extendedprice").cast(DEC_P) * (
        F.lit(1).cast(DEC_R) - F.col("l_discount").cast(DEC_R)
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(revenue, s.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per (brand, type, size) with a
    NOT-IN supplier exclusion (negative balance stands in for dbgen's
    complaint comments) — anti-join + countDistinct."""
    ps = derived_partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(bad, ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .join(p, ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = PS_CTE + """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers in one region holding surplus stock (availqty >
    half the year's shipments) of promoted parts — nested IN subqueries
    with a correlated aggregate, rewritten as semi-joins + pre-agg.

    The correlated SUM is per part (not per part+supplier): derived
    partsupp pairs only partially overlap lineitem's, and per-part demand
    keeps the result non-degenerate at every SF. Inner join against the
    pre-agg reproduces SQL's NULL-comparison exclusion of never-shipped
    parts."""
    ps = derived_partsupp(spark, sf_dir)
    red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    shipped = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .groupBy(F.col("l_partkey"))
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    cand = (
        ps.join(red, ps.ps_partkey == red.p_partkey, "left_semi")
        .join(shipped, ps.ps_partkey == shipped.l_partkey)
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cand, s.s_suppkey == cand.ps_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


Q20_SQL = PS_CTE + """
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM partsupp
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND ps_availqty > (SELECT 0.5 * SUM(l_quantity) FROM lineitem
                         WHERE l_partkey = ps_partkey
                           AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'))
"""


QUERIES = {
    "q2_min_cost_supplier": QuerySpec(q2_min_cost_supplier, Q2_SQL, "Q2: min-cost supplier per part"),
    "q9_product_profit": QuerySpec(q9_product_profit, Q9_SQL, "Q9: profit by nation and year"),
    "q11_important_stock": QuerySpec(q11_important_stock, Q11_SQL, "Q11: fraction-of-total HAVING"),
    "q15_top_supplier": QuerySpec(q15_top_supplier, Q15_SQL, "Q15: max-revenue supplier view"),
    "q16_supplier_part_counts": QuerySpec(
        q16_supplier_part_counts, Q16_SQL, "Q16: NOT-IN + countDistinct"
    ),
    "q20_promotion_suppliers": QuerySpec(
        q20_promotion_suppliers, Q20_SQL, "Q20: nested-IN surplus stock"
    ),
}
