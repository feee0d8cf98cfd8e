"""Second relational coverage wave: grouping-set families, set operations,
correlated subqueries, pivot, scalar string/date function suites, approx
aggregates, and the SQL-gateway surface (spark.sql over registered views).

Dialect discipline for the oracles:
- day-of-week conventions differ between engines — date features stick to
  year/quarter/month/day/ISO week and explicit day diffs;
- approx_count_distinct sketches differ by construction -> rows-only check
  with exact bounds asserted in unit tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monster_etl_spark.queries import QuerySpec, load
from monster_etl_spark.sql import sql as run_sql


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
    )


Q_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets with GROUPING() markers to disambiguate NULL
    group keys from NULL data."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag, CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """,
    )


Q_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag, CAST(grouping(l_linestatus) AS BIGINT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers appearing both as urgent-order and low-priority-order
    placers — INTERSECT (distinct set semantics)."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    low = o.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    return urgent.intersect(low)


Q_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part keys never shipped — EXCEPT (distinct set semantics)."""
    p = load(spark, sf_dir, "part").select("p_partkey")
    l = load(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("p_partkey"))
    return p.subtract(l)  # EXCEPT DISTINCT semantics


Q_EXCEPT_SQL = """
SELECT p_partkey FROM part
EXCEPT
SELECT l_partkey FROM lineitem
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL gateway."""
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT c_custkey,
               (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        """,
    )


Q_SCALAR_SUBQUERY_SQL = """
SELECT c_custkey,
       (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
FROM customer
"""


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(
        spark,
        sf_dir,
        """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """,
    )


Q_IN_SUBQUERY_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: status values become columns."""
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    # Spark pivot yields NULL for an empty cell; COUNT(*) FILTER yields 0 —
    # coalesce so the parity holds even when a combination is absent
    return pivoted.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("O", "F", "P")],
    )


Q_PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.substring("p_name", 1, 4).alias("sub4"),
        F.length("p_name").cast("long").alias("len"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
        F.levenshtein(F.col("p_name"), F.col("p_type")).cast("long").alias("lev"),
        F.reverse(F.col("p_brand")).alias("rev_brand"),
        F.lpad(F.col("p_brand"), 10, "*").alias("padded"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
    )


Q_STRING_SQL = """
SELECT p_partkey,
       upper(p_name) AS up,
       substr(p_name, 1, 4) AS sub4,
       length(p_name) AS len,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       split_part(p_name, ' ', 1) AS first_word,
       levenshtein(p_name, p_type) AS lev,
       reverse(p_brand) AS rev_brand,
       lpad(p_brand, 10, '*') AS padded,
       concat_ws('/', p_brand, p_type) AS brand_type
FROM part
"""


def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    # integer features as BIGINT and date outputs as ISO strings: aligns
    # pandas dtypes across engines (Spark DATE -> object(date) while DuckDB
    # DATE -> datetime64; int functions are int32 here, BIGINT there)
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("y"),
        F.quarter(d).cast("long").alias("q"),
        F.month(d).cast("long").alias("m"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.date_add(d, 30).cast("string").alias("plus30"),
        F.last_day(d).cast("string").alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).cast("long").alias("days_to_2002"),
    )


Q_DATE_SQL = """
SELECT o_orderkey,
       CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
       CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS q,
       CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
       CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT) AS dom,
       CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
       CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS plus30,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002
FROM orders
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate pushes to
    the parquet scan, the aggregate is a single global sum."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(8,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog approximate distinct counts, oracle-checked via the
    error CONTRACT rather than the estimate: sketch values differ across
    engines by construction, but |approx/exact - 1| <= 3*rsd is the
    HLL++ guarantee the estimate must satisfy (Spark's sketch is
    deterministic for fixed data, so the boolean is hash-stable). The
    oracle pins exact counts and asserts the bounds truthfully. Raw
    estimates are still produced (sanity-bounded in
    tests/test_relational2.py)."""
    l = load(spark, sf_dir, "lineitem")
    rsd = 0.05
    agg = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = (
        lambda a, e: (F.abs(F.col(a) / F.col(e) - 1) <= 3 * rsd).alias(a + "_within_bounds")
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        within("approx_orders", "exact_orders"),
        within("approx_parts", "exact_parts"),
    )


Q_APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_orders_within_bounds,
       TRUE AS approx_parts_within_bounds
FROM lineitem
GROUP BY l_returnflag
"""


def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch (Greenwald-Khanna) estimate, oracle-checked via the
    error contract like q_approx_distinct: with accuracy A the sketch's
    rank error is <= N/A, so the approximate median must land between the
    exact 45th and 55th percentiles (N/A is far below 5% of N at every
    SF). The oracle pins the exact bounds and asserts the contract."""
    l = load(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("ap50"),
        F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
    )
    return agg.select(
        "l_returnflag",
        F.round("p45", 6).alias("p45"),
        F.round("p55", 6).alias("p55"),
        ((F.col("ap50") >= F.col("p45")) & (F.col("ap50") <= F.col("p55"))).alias(
            "p50_within_bounds"
        ),
    )


Q_APPROX_PERCENTILE_SQL = """
SELECT l_returnflag,
       round(percentile_cont(0.45) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p45,
       round(percentile_cont(0.55) WITHIN GROUP (ORDER BY l_extendedprice), 6) AS p55,
       TRUE AS p50_within_bounds
FROM lineitem
GROUP BY l_returnflag
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the same
    continuous-quantile definition on the sorted values)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("median_price"),
        F.percentile("o_totalprice", 0.9).alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


Q_PERCENTILES_SQL = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS median_price,
       quantile_cont(o_totalprice, 0.9) AS p90_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
"""


def q_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean and sample stddev derived from exact decimal sums — the naive
    stddev aggregate accumulates floats in partition order and is not
    reproducible across engines; sum/sum-of-squares in DECIMAL are exact,
    and the final double formula is a deterministic function of them.

    Range note: the scale-4 sum-of-squares stays within exact double range
    (unscaled < 2^53) up to roughly sf=1 (~6M rows); beyond that the final
    decimal->double conversion re-enters the double-rounding regime q1
    works around with integer-space HALF_UP (apply the same trick here if
    the correctness gate ever moves past sf=1)."""
    l = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    s1 = F.sum(p).cast("double")
    s2 = F.sum(p * p).cast("double")
    n = F.count(F.lit(1))
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        F.round(s1 / n, 6).alias("mean_price"),
        F.round(F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))), 6).alias("stddev_price"),
    )


Q_STATS_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS mean_price,
  round(sqrt((CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
             / (COUNT(*) - 1)), 6) AS stddev_price
FROM lineitem GROUP BY l_returnflag
"""


def q_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day order count/value per customer — a RANGE frame over a
    day-number key (integer day arithmetic keeps the frame definition
    identical across engines)."""
    o = load(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-6, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("orders_7d"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("value_7d"),
    )


Q_TRAILING_SQL = """
SELECT o_custkey, o_orderkey,
  COUNT(*) OVER w AS orders_7d,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS value_7d
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
)
"""


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking/distribution window functions: ntile, rank,
    dense_rank, percent_rank, cume_dist, first/last value — all over a
    fully deterministic ordering."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
    )


Q_WINDOW_SUITE_SQL = """
SELECT o_orderkey, o_orderstatus,
  ntile(4) OVER w AS quartile,
  rank() OVER w AS rnk,
  dense_rank() OVER w AS drnk,
  round(percent_rank() OVER w, 6) AS prank,
  round(cume_dist() OVER w, 6) AS cdist,
  first_value(o_orderkey) OVER w AS cheapest_key
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


def q_array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over a constructed array column:
    transform/filter/exists/forall/aggregate/sort/slice/zip_with — the
    Catalyst lambda surface (DuckDB mirrors with list_* lambdas)."""
    l = load(spark, sf_dir, "lineitem")
    arr = F.array(F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100)
    # Array-typed outputs are JSON-serialized (to_json matches DuckDB
    # byte-for-byte) so the driver's pandas canonicalizer hashes scalars.
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.to_json(F.transform(arr, lambda x: F.round(x * 2, 4))).alias("doubled"),
        F.to_json(F.filter(arr, lambda x: x > 5)).alias("big_vals"),
        F.exists(arr, lambda x: x > 40).alias("any_big"),
        F.forall(arr, lambda x: x >= 0).alias("all_nonneg"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), 4).alias("arr_sum"),
        F.to_json(F.array_sort(F.transform(arr, lambda x: F.round(x, 4)))).alias("sorted_vals"),
        F.to_json(
            F.slice(F.array_sort(F.transform(arr, lambda x: F.round(x, 4))), 1, 2)
        ).alias("smallest2"),
        F.round(
            F.aggregate(
                F.zip_with(arr, F.reverse(arr), lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("rev_dot"),
    )


Q_ARRAY_HOF_SQL = """
SELECT l_orderkey, l_linenumber,
  CAST(to_json(list_transform(arr, x -> round(x * 2, 4))) AS VARCHAR) AS doubled,
  CAST(to_json(list_filter(arr, x -> x > 5)) AS VARCHAR) AS big_vals,
  len(list_filter(arr, x -> x > 40)) > 0 AS any_big,
  len(list_filter(arr, x -> NOT x >= 0)) = 0 AS all_nonneg,
  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr), (acc, x) -> acc + x), 4) AS arr_sum,
  CAST(to_json(list_sort(list_transform(arr, x -> round(x, 4)))) AS VARCHAR) AS sorted_vals,
  CAST(to_json(list_sort(list_transform(arr, x -> round(x, 4)))[1:2]) AS VARCHAR) AS smallest2,
  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list_transform(range(1, len(arr) + 1), i -> arr[i] * list_reverse(arr)[i])),
        (acc, x) -> acc + x), 4) AS rev_dot
FROM (
  SELECT l_orderkey, l_linenumber,
         [l_quantity, l_discount * 100, l_tax * 100] AS arr
  FROM lineitem
)
"""


def q_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract, extract-all, count, membership,
    position — patterns restricted to the Java/RE2-compatible subset."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_name"), "([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.to_json(F.regexp_extract_all(F.col("p_name"), F.lit("[aeiou]"), 0)).alias("vowels"),
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).cast("long").alias("n_vowels"),
        F.col("p_name").rlike("^(small|large)").alias("sized"),
        F.regexp_instr(F.col("p_name"), F.lit("widget")).cast("long").alias("widget_pos"),
    )


Q_REGEX_SQL = """
SELECT p_partkey,
  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
  CAST(to_json(regexp_extract_all(p_name, '[aeiou]')) AS VARCHAR) AS vowels,
  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
  regexp_matches(p_name, '^(small|large)') AS sized,
  CASE WHEN strpos(p_name, 'widget') > 0 THEN strpos(p_name, 'widget') ELSE 0 END AS widget_pos
FROM part
"""



_CORR_PAIRS = (
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
)


def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (upper triangle) over lineitem numeric
    columns, derived from EXACT decimal sums — corr() proper accumulates
    floats in partition order and is not reproducible across engines, so
    every moment (Σx, Σy, Σxy, Σx², Σy²) is an exact DECIMAL aggregate,
    converted to double once, and corr is a deterministic closed-form of
    those six numbers. One aggregate pass computes every pair's moments
    simultaneously (all map-side combinable); output is one row per
    column pair."""
    l = load(spark, sf_dir, "lineitem")
    dec = {
        "l_quantity": F.col("l_quantity").cast("decimal(12,2)"),
        "l_extendedprice": F.col("l_extendedprice").cast("decimal(12,2)"),
        "l_discount": F.col("l_discount").cast("decimal(12,2)"),
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    seen = set()
    for x, y in _CORR_PAIRS:
        for c in (x, y):
            if c not in seen:
                seen.add(c)
                aggs.append(F.sum(dec[c]).cast("double").alias(f"s_{c}"))
                aggs.append(F.sum(dec[c] * dec[c]).cast("double").alias(f"ss_{c}"))
        aggs.append(F.sum(dec[x] * dec[y]).cast("double").alias(f"sp_{x}_{y}"))
    wide = l.agg(*aggs)

    rows = []
    for x, y in _CORR_PAIRS:
        n = F.col("n")
        num = n * F.col(f"sp_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        den = F.sqrt(n * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")) * F.sqrt(
            n * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")
        )
        rows.append(
            wide.select(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.round(num / den, 6).alias("pearson_r"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _corr_sql() -> str:
    def d(c):
        return f"CAST({c} AS DECIMAL(12,2))"

    moments = ["count(*) AS n"]
    seen = set()
    for x, y in _CORR_PAIRS:
        for c in (x, y):
            if c not in seen:
                seen.add(c)
                moments.append(f"CAST(SUM({d(c)}) AS DOUBLE) AS s_{c}")
                moments.append(f"CAST(SUM({d(c)} * {d(c)}) AS DOUBLE) AS ss_{c}")
        moments.append(f"CAST(SUM({d(x)} * {d(y)}) AS DOUBLE) AS sp_{x}_{y}")
    selects = []
    for x, y in _CORR_PAIRS:
        selects.append(
            f"""SELECT '{x}' AS col_x, '{y}' AS col_y,
  round((n * sp_{x}_{y} - s_{x} * s_{y})
        / (sqrt(n * ss_{x} - s_{x} * s_{x}) * sqrt(n * ss_{y} - s_{y} * s_{y})), 6)
    AS pearson_r FROM agg"""
        )
    u = "\nUNION ALL\n".join(selects)
    return f"WITH agg AS (SELECT {', '.join(moments)} FROM lineitem)\n{u}"



def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation, scale-safe: per-customer
    recency/frequency/monetary in one combinable aggregate, quartile
    BOUNDARIES from one global percentile aggregate broadcast back as a
    1-row crossJoin, and the quartile assignment as plain comparisons
    (1 + Σ metric > q_i). The usual ntile(4) formulation is a
    single-partition global sort — the same plan defect the sharded
    token packer avoids; boundary-assignment gives identical
    segmentation semantics with no window at all. Monetary goes through
    DECIMAL; output is segment cell -> customer count."""
    o = load(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("monetary"),
    )
    # recency as a number both engines order identically: epoch seconds
    base = base.withColumn("recency", F.unix_timestamp(F.col("last_order")).cast("double"))
    qs = base.agg(
        *[
            F.expr(f"percentile({m}, {p})").alias(f"{m}_q{i}")
            for m in ("recency", "frequency", "monetary")
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def quartile(m: str):
        c = F.col(m)
        return (
            F.lit(1)
            + (c > F.col(f"{m}_q1")).cast("int")
            + (c > F.col(f"{m}_q2")).cast("int")
            + (c > F.col(f"{m}_q3")).cast("int")
        ).cast("long")

    seg = base.crossJoin(F.broadcast(qs)).select(
        quartile("recency").alias("r_quartile"),
        quartile("frequency").alias("f_quartile"),
        quartile("monetary").alias("m_quartile"),
    )
    return seg.groupBy("r_quartile", "f_quartile", "m_quartile").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


Q_RFM_SQL = """
WITH base AS (
  SELECT o_custkey,
         CAST(epoch(max(o_orderdate)) AS DOUBLE) AS recency,
         count(*) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
qs AS (
  SELECT
    percentile_cont(0.25) WITHIN GROUP (ORDER BY recency) AS recency_q1,
    percentile_cont(0.5)  WITHIN GROUP (ORDER BY recency) AS recency_q2,
    percentile_cont(0.75) WITHIN GROUP (ORDER BY recency) AS recency_q3,
    percentile_cont(0.25) WITHIN GROUP (ORDER BY frequency) AS frequency_q1,
    percentile_cont(0.5)  WITHIN GROUP (ORDER BY frequency) AS frequency_q2,
    percentile_cont(0.75) WITHIN GROUP (ORDER BY frequency) AS frequency_q3,
    percentile_cont(0.25) WITHIN GROUP (ORDER BY monetary) AS monetary_q1,
    percentile_cont(0.5)  WITHIN GROUP (ORDER BY monetary) AS monetary_q2,
    percentile_cont(0.75) WITHIN GROUP (ORDER BY monetary) AS monetary_q3
  FROM base
)
SELECT
  CAST(1 + (recency > recency_q1)::INT + (recency > recency_q2)::INT
         + (recency > recency_q3)::INT AS BIGINT) AS r_quartile,
  CAST(1 + (frequency > frequency_q1)::INT + (frequency > frequency_q2)::INT
         + (frequency > frequency_q3)::INT AS BIGINT) AS f_quartile,
  CAST(1 + (monetary > monetary_q1)::INT + (monetary > monetary_q2)::INT
         + (monetary > monetary_q3)::INT AS BIGINT) AS m_quartile,
  count(*) AS n_customers
FROM base CROSS JOIN qs
GROUP BY 1, 2, 3
"""


QUERIES = {
    "q_cube": QuerySpec(q_cube, Q_CUBE_SQL, "CUBE grouping sets"),
    "q_grouping_sets": QuerySpec(q_grouping_sets, Q_GROUPING_SETS_SQL, "explicit grouping sets + GROUPING()"),
    "q_intersect": QuerySpec(q_intersect, Q_INTERSECT_SQL, "INTERSECT set op"),
    "q_except": QuerySpec(q_except, Q_EXCEPT_SQL, "EXCEPT set op"),
    "q_scalar_subquery": QuerySpec(q_scalar_subquery, Q_SCALAR_SUBQUERY_SQL, "correlated scalar subquery via SQL gateway"),
    "q_in_subquery": QuerySpec(q_in_subquery, Q_IN_SUBQUERY_SQL, "IN subquery via SQL gateway"),
    "q_pivot": QuerySpec(q_pivot, Q_PIVOT_SQL, "pivot to columns"),
    "q_string_functions": QuerySpec(q_string_functions, Q_STRING_SQL, "scalar string function suite"),
    "q_date_functions": QuerySpec(q_date_functions, Q_DATE_SQL, "scalar date function suite"),
    "q6_forecast_revenue": QuerySpec(q6_forecast_revenue, Q6_SQL, "TPC-H Q6 scan-filter-agg"),
    "q_approx_distinct": QuerySpec(
        q_approx_distinct, Q_APPROX_DISTINCT_SQL, "HLL approx distinct, error-contract checked"
    ),
    "q_approx_percentile": QuerySpec(
        q_approx_percentile, Q_APPROX_PERCENTILE_SQL, "GK quantile sketch, error-contract checked"
    ),
    "q_percentiles": QuerySpec(q_percentiles, Q_PERCENTILES_SQL, "exact interpolated percentiles"),
    "q_stats_exact": QuerySpec(q_stats_exact, Q_STATS_SQL, "mean/stddev from exact sums"),
    "q_correlation": QuerySpec(q_correlation, _corr_sql(), "Pearson matrix from exact moments"),
    "q_rfm_segments": QuerySpec(q_rfm_segments, Q_RFM_SQL, "window-free RFM quartile segmentation"),
    "q_trailing_range_window": QuerySpec(q_trailing_range_window, Q_TRAILING_SQL, "RANGE-frame trailing window"),
    "q_window_suite": QuerySpec(q_window_suite, Q_WINDOW_SUITE_SQL, "ranking/distribution window functions"),
    "q_array_hof_suite": QuerySpec(q_array_hof_suite, Q_ARRAY_HOF_SQL, "higher-order array functions"),
    "q_regex_suite": QuerySpec(q_regex_suite, Q_REGEX_SQL, "regex scalar surface"),
}


MAD_K = 3.0  # flag beyond 3 robust sigmas
MAD_SIGMA = 1.4826  # consistency constant: MAD -> sigma under normality


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: flag events whose value sits
    more than 3 robust sigmas (1.4826 * MAD) from their event type's
    median. The median/MAD pair survives the heavy tails that wreck
    mean/stddev z-scores — the standard data-quality screen before
    training-set statistics.

    Two exact interpolated percentiles (both map-side-combinable
    aggregates, grouped on the small event-type key), each joined back
    broadcast; no window, no global sort. Returns only the flagged rows
    plus the per-group stats so the oracle hashes a small frame. Median
    and MAD are rounded 6dp BEFORE the comparison on both engines so the
    flag decision bit-agrees."""
    e = load(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), on="event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), on="event_type")
        .filter(F.col("adev") > F.lit(MAD_K * MAD_SIGMA) * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            "med",
            "mad",
            F.round(F.col("adev") / (F.lit(MAD_SIGMA) * F.col("mad")), 6).alias(
                "robust_z"
            ),
        )
    )


Q_MAD_SQL = f"""
WITH med AS (
  SELECT event_type,
         round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS med
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.*, med, abs(value - med) AS adev
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type,
         round(percentile_cont(0.5) WITHIN GROUP (ORDER BY adev), 6) AS mad
  FROM dev GROUP BY 1
)
SELECT event_id, event_type, round(value, 6) AS value, med, mad,
       round(adev / ({MAD_SIGMA} * mad), 6) AS robust_z
FROM dev JOIN mad USING (event_type)
WHERE adev > {MAD_K * MAD_SIGMA} * mad
"""

QUERIES["q_mad_outliers"] = QuerySpec(
    q_mad_outliers, Q_MAD_SQL, "median/MAD robust per-group outlier screen"
)
