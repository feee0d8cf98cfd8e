"""Reference-operator parity queries (SURVEY.md §2.2/§2.4/§2.9).

Each query exercises one reference transform (T1-T15, A1/A2, P2) through
the engine's actual operator functions over the synthetic testdata tables,
with a DuckDB oracle pinning the semantics — e.g. the ``.0``-strip long
parse, boolean-by-membership, nan-sentinel arrays, and the
remove-before-parse chain order.

T16 (path-derived column) is oracle-backed via a partition-dir round-trip:
the query stages data under ``ancestry=.../`` dirs and re-derives the value
from ``input_file_name()``, while the oracle computes it from the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monster_etl_spark.config import TableConfig
from monster_etl_spark.naming import columns_to_snake_case
from monster_etl_spark.operators import transforms as tr
from monster_etl_spark.plans.v2f import transform_table
from monster_etl_spark.queries import QuerySpec, load


def t1_rename_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "customer")
    return tr.rename_fields(
        df, {"c_name": "customer_name", "c_acctbal": "account_balance", "not_there": "x"}
    ).select("c_custkey", "customer_name", "account_balance")


T1_SQL = "SELECT c_custkey, c_name AS customer_name, c_acctbal AS account_balance FROM customer"


def t2_remove_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "part")
    return tr.remove_fields(df, {"p_brand", "p_retailprice", "not_there"})


T2_SQL = "SELECT p_partkey, p_name, p_type, p_size FROM part"


def t3_extract_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "supplier")
    return tr.extract_fields(df, {"s_suppkey", "s_name"})


T3_SQL = "SELECT s_suppkey, s_name FROM supplier"


def t4_collect_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Output contract: array columns are JSON-serialized so the driver's
    # pandas canonicalizer hashes scalars (Spark to_json == DuckDB to_json
    # byte-for-byte, verified incl. null elements / empty arrays).
    df = load(spark, sf_dir, "customer")
    return tr.collect_fields(df, ["c_mktsegment", "c_name"], "collected").select(
        "c_custkey", F.to_json("collected").alias("collected")
    )


T4_SQL = """
SELECT c_custkey,
       CAST(to_json(list_filter([c_mktsegment, c_name], x -> x IS NOT NULL)) AS VARCHAR) AS collected
FROM customer
"""


def t5_concat_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "nation").withColumn("rk", F.col("n_regionkey").cast("string"))
    return tr.concat_fields(df, ["n_name", "rk"], "nation_code", ":").select(
        "n_nationkey", "nation_code"
    )


T5_SQL = "SELECT n_nationkey, n_name || ':' || CAST(n_regionkey AS VARCHAR) AS nation_code FROM nation"


def t7_snake_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    # camel-case the schema, then snake-case it back through the operator
    df = load(spark, sf_dir, "region").toDF("rRegionKey", "rName")
    return columns_to_snake_case(df)


T7_SQL = "SELECT r_regionkey AS r_region_key, r_name AS r_name FROM region"


def t9_parse_longs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # double -> raw text with trailing .0 -> reference long parse
    df = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("string").alias("qty_raw")
    )
    return tr.parse_longs(df, {"qty_raw"}).withColumnsRenamed({"qty_raw": "qty_long"})


T9_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(regexp_replace(CAST(l_quantity AS VARCHAR), '\\.0$', '') AS BIGINT) AS qty_long
FROM lineitem
"""


def t10_parse_doubles_nan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # zero discounts masked with the "." nan sentinel, then parsed back
    df = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") == 0, F.lit(".")).otherwise(F.col("l_discount").cast("string")).alias("disc_raw"),
    )
    return tr.parse_doubles(df, {"disc_raw"}, nan_values={"."}).withColumnsRenamed(
        {"disc_raw": "disc_double"}
    )


T10_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount = 0 THEN NULL ELSE CAST(CAST(l_discount AS VARCHAR) AS DOUBLE) END AS disc_double
FROM lineitem
"""


def t11_parse_booleans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # membership test, NOT a cast: only 'F' is true
    df = load(spark, sf_dir, "orders").select("o_orderkey", F.col("o_orderstatus").alias("is_finished"))
    return tr.parse_booleans(df, {"is_finished"}, true_values=("F",))


T11_SQL = "SELECT o_orderkey, o_orderstatus IN ('F') AS is_finished FROM orders"


def t12_parse_string_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "part").select("p_partkey", F.col("p_name").alias("name_tokens"))
    out = tr.parse_string_arrays(df, {"name_tokens"}, " ")
    return out.select("p_partkey", F.to_json("name_tokens").alias("name_tokens"))


T12_SQL = (
    "SELECT p_partkey, CAST(to_json(string_split(p_name, ' ')) AS VARCHAR) AS name_tokens FROM part"
)


def t13_parse_double_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    # delimited numeric text with a nan sentinel element
    df = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(",", F.col("l_discount").cast("string"), F.lit("."), F.col("l_tax").cast("string")).alias("vals"),
    )
    out = tr.parse_double_arrays(df, {"vals"}, ",", nan_values={"."})
    return out.select("l_orderkey", "l_linenumber", F.to_json("vals").alias("vals"))


T13_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(to_json(list_transform(
         string_split(CAST(l_discount AS VARCHAR) || ',.,' || CAST(l_tax AS VARCHAR), ','),
         x -> CASE WHEN x = '.' THEN NULL ELSE CAST(x AS DOUBLE) END
       )) AS VARCHAR) AS vals
FROM lineitem
"""


def t15_ensure_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segments")
    )
    out = tr.ensure_arrays(df, {"segments"})
    return out.select("c_custkey", F.to_json("segments").alias("segments"))


T15_SQL = """
SELECT c_custkey,
       CAST(to_json(CASE WHEN c_mktsegment IS NULL THEN [] ELSE [c_mktsegment] END) AS VARCHAR) AS segments
FROM customer
"""


def p4_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2 (the variants-merge shape): union by name + dedup on an
    extracted scalar key — the reference pipeline's single shuffle."""
    l = load(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("id"))
    o = load(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("id"))
    return tr.distinct_by(tr.union_all([l, o]), ["id"])


P4_SQL = """
SELECT DISTINCT id FROM (
  SELECT l_orderkey AS id FROM lineitem
  UNION ALL
  SELECT o_orderkey AS id FROM orders
)
"""


# P2: the full config-driven chain (rename -> remove -> parse doubles ->
# longs -> booleans -> arrays) over a string-typed projection of lineitem.
_P2_CONFIG = TableConfig(
    table_name="lineitem_demo",
    fields_to_rename={"l_returnflag": "returned"},
    fields_to_remove=frozenset({"l_linestatus"}),
    fields_to_double=frozenset({"l_discount"}),
    fields_to_long=frozenset({"l_quantity"}),
    fields_to_boolean=frozenset({"returned"}),
    boolean_true_values=frozenset({"R"}),
    string_array_fields={"-": frozenset({"l_shipmode"})},
)


def p2_transform_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("string").alias("l_quantity"),
        F.col("l_discount").cast("string").alias("l_discount"),
        "l_returnflag",
        "l_linestatus",
    )
    return transform_table(df, _P2_CONFIG)


P2_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(regexp_replace(CAST(l_quantity AS VARCHAR), '\\.0$', '') AS BIGINT) AS l_quantity,
       CAST(CAST(l_discount AS VARCHAR) AS DOUBLE) AS l_discount,
       l_returnflag IN ('R') AS returned
FROM lineitem
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join: row-identical to the plain join (the oracle IS
    the plain join), but each hot key's rows scatter over salt_factor
    shuffle buckets so no single task drowns. operators/joins.py."""
    from monster_etl_spark.operators.joins import salted_join

    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    return (
        salted_join(l, o, "l_orderkey", salt_factor=8)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
        )
    )


Q_SALTED_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins upsert merge (batch MERGE INTO shape): synthetic updates
    double the price of every 10th order; the merged table must contain the
    update for those keys and the original row otherwise
    (operators/maintenance.py)."""
    from monster_etl_spark.operators.maintenance import merge_upsert

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    updates = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
        .withColumn("o_orderstatus", F.lit("U"))
    )
    # same precedence value on both sides -> tie broken toward updates
    t = o.withColumn("v", F.lit(1))
    u = updates.withColumn("v", F.lit(1))
    return merge_upsert(t, u, key="o_orderkey", precedence="v").drop("v")


Q_MERGE_SQL = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 0 THEN round(o_totalprice * 2, 2) ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus
FROM orders
"""


def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass exact data profile of designated columns
    (operators/maintenance.py::exact_profile)."""
    from monster_etl_spark.operators.maintenance import exact_profile

    return exact_profile(
        load(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_returnflag", "l_quantity"],
    )


Q_PROFILE_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_orderkey__nulls,
       COUNT(DISTINCT l_orderkey) AS l_orderkey__distinct,
       MIN(l_orderkey) AS l_orderkey__min,
       MAX(l_orderkey) AS l_orderkey__max,
       CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_returnflag__nulls,
       COUNT(DISTINCT l_returnflag) AS l_returnflag__distinct,
       MIN(l_returnflag) AS l_returnflag__min,
       MAX(l_returnflag) AS l_returnflag__max,
       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS l_quantity__nulls,
       COUNT(DISTINCT l_quantity) AS l_quantity__distinct,
       MIN(l_quantity) AS l_quantity__min,
       MAX(l_quantity) AS l_quantity__max
FROM lineitem
"""


def t16_path_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T16 oracle-backed: stage nation partitioned by an ``ancestry=...``
    directory (the reference's exact layout, ``V2FUtils.scala:80``), read
    it back, and re-derive ancestry FROM THE FILE PATH ALONE via
    ``add_ancestry_id``. The oracle derives the same value from the data —
    if path extraction drifts, the hashes diverge. The scratch dir is
    deterministic and the write idempotent (mode=overwrite)."""
    d = load(spark, sf_dir, "nation")
    staged = d.select(
        "n_nationkey",
        "n_name",
        F.concat(F.lit("reg"), F.col("n_regionkey").cast("string")).alias("ancestry"),
    )
    from monster_etl_spark.scratch import scratch_path

    out = scratch_path("t16_ancestry")
    staged.write.mode("overwrite").partitionBy("ancestry").parquet(out)
    # drop the discovered partition column so the value can ONLY come from
    # the path regex
    back = spark.read.parquet(out).drop("ancestry")
    return tr.add_ancestry_id(back, strict=True).select("n_nationkey", "n_name", "ancestry")


T16_SQL = """
SELECT n_nationkey, n_name, 'reg' || CAST(n_regionkey AS VARCHAR) AS ancestry
FROM nation
"""



def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-curve) key over (o_custkey, o_totalprice): the layout
    step of a multi-dimensional data-skipping OPTIMIZE pass
    (operators/maintenance.py::zorder_layout). The key itself is emitted
    per order so the oracle can pin every scale/shift/interleave bit; the
    repartitionByRange+sort layout around it is exercised in
    tests/test_maintenance.py against real parquet file statistics."""
    from monster_etl_spark.operators.maintenance import zorder_key

    o = load(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice"]
    bounds = o.agg(
        *[a for c in cols for a in (F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}"))]
    )
    mins = {c: F.col(f"__min_{c}") for c in cols}
    maxs = {c: F.col(f"__max_{c}") for c in cols}
    return (
        o.crossJoin(F.broadcast(bounds))
        .select("o_orderkey", zorder_key(cols, mins, maxs, bits=8).alias("zval"))
    )


_Z_SCALED = """least(greatest(coalesce(CAST(floor(
      (CAST({c} AS DOUBLE) - CAST(mn{j} AS DOUBLE))
      / nullif(CAST(mx{j} AS DOUBLE) - CAST(mn{j} AS DOUBLE), 0.0) * 255
    ) AS BIGINT), 0), 0), 255)"""


def _z_interleave_sql() -> str:
    terms = []
    for j, c in enumerate(["o_custkey", "o_totalprice"]):
        scaled = _Z_SCALED.format(c=c, j=j)
        for b in range(8):
            terms.append(f"((({scaled} >> {b}) & 1) << {b * 2 + j})")
    return " + ".join(terms)


Q_ZORDER_SQL = f"""
WITH bnd AS (SELECT min(o_custkey) AS mn0, max(o_custkey) AS mx0,
                    min(o_totalprice) AS mn1, max(o_totalprice) AS mx1
             FROM orders)
SELECT o_orderkey, CAST({_z_interleave_sql()} AS BIGINT) AS zval
FROM orders CROSS JOIN bnd
"""



HIST_BUCKETS = 10


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of o_totalprice (10 buckets over the observed
    [min, max]): the profiling companion to exact_profile. One bounds
    aggregate broadcast back as a 1-row crossJoin (no driver collect),
    then width_bucket + count per bucket — two map-side-combinable
    aggregations, no sort. The max value folds into the last bucket,
    matching the usual histogram convention."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    # explicit arithmetic instead of width_bucket (absent in DuckDB):
    # identical IEEE expression both sides keeps bucket edges bit-equal.
    # nullif guards the degenerate mn == mx column (width 0): the null
    # division is coalesced to bucket 1 on BOTH engines, instead of
    # Spark's null-skipping least() folding rows into the top bucket
    # while DuckDB divides by zero.
    bucket = F.least(
        F.coalesce(
            (
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / (F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0)) / HIST_BUCKETS)
                )
                + 1
            ).cast("long"),
            F.lit(1).cast("long"),
        ),
        F.lit(HIST_BUCKETS).cast("long"),
    )
    b = o.crossJoin(F.broadcast(bounds)).select(
        bucket.alias("bucket"), "o_totalprice"
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


Q_HISTOGRAM_SQL = f"""
WITH bounds AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders)
SELECT least(coalesce(CAST(floor((o_totalprice - mn) / (nullif(mx - mn, 0.0) / {HIST_BUCKETS})) AS BIGINT) + 1,
                      CAST(1 AS BIGINT)),
             CAST({HIST_BUCKETS} AS BIGINT)) AS bucket,
       count(*) AS n_rows,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders CROSS JOIN bounds
GROUP BY 1
"""



def q_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract gate over orders (operators/maintenance.py::
    expectations): five per-row rules in ONE aggregate scan plus a
    uniqueness rule (count - distinct), stacked into the standard
    (rule, n_violations, passed) report. The deliberately-failing rule
    (totalprice <= 400000) proves violations are counted, not just
    flagged."""
    from monster_etl_spark.operators.maintenance import expectations, unique_rule

    o = load(spark, sf_dir, "orders")
    per_row = expectations(
        o,
        {
            "orderkey_not_null": F.col("o_orderkey").isNotNull(),
            "totalprice_positive": F.col("o_totalprice") > 0,
            "totalprice_under_400k": F.col("o_totalprice") <= 400000,
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "date_in_range": F.col("o_orderdate") >= F.lit("1992-01-01").cast("date"),
        },
    )
    uniq = unique_rule(o, ["o_orderkey"], "orderkey_unique")
    return per_row.unionByName(uniq)


Q_EXPECTATIONS_SQL = """
WITH agg AS (
  SELECT
    sum(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END) AS orderkey_not_null,
    sum(CASE WHEN coalesce(o_totalprice > 0, FALSE) THEN 0 ELSE 1 END) AS totalprice_positive,
    sum(CASE WHEN coalesce(o_totalprice <= 400000, FALSE) THEN 0 ELSE 1 END) AS totalprice_under_400k,
    sum(CASE WHEN coalesce(o_orderstatus IN ('O', 'F', 'P'), FALSE) THEN 0 ELSE 1 END) AS status_in_domain,
    sum(CASE WHEN coalesce(o_orderdate >= DATE '1992-01-01', FALSE) THEN 0 ELSE 1 END) AS date_in_range,
    count(*) - count(DISTINCT o_orderkey) AS orderkey_unique
  FROM orders
)
SELECT rule, CAST(n_violations AS BIGINT) AS n_violations, n_violations = 0 AS passed
FROM agg UNPIVOT (n_violations FOR rule IN (
  orderkey_not_null, totalprice_positive, totalprice_under_400k,
  status_in_domain, date_in_range, orderkey_unique))
"""



def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two synthetic snapshots of orders (operators/
    incremental.py::snapshot_diff): "new" drops every 50th order
    (deleted), doubles the price of every 7th (changed), and appends
    shifted-key copies (inserted). One full-outer join on the key;
    null-safe content hashing. Summarized as change_type counts so the
    oracle pins the complete classification."""
    from monster_etl_spark.operators.incremental import snapshot_diff

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    old = o
    new = (
        o.filter(F.col("o_orderkey") % 50 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") * 2, 2)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return (
        snapshot_diff(old, new, "o_orderkey")
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


Q_SNAPSHOT_DIFF_SQL = """
WITH old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice * 2, 2)
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 50 != 0
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 97 = 0
),
classified AS (
  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'inserted'
              WHEN n.o_orderkey IS NULL THEN 'deleted'
              WHEN o.o_totalprice != n.o_totalprice
                OR o.o_orderstatus != n.o_orderstatus THEN 'changed'
         END AS change_type
  FROM old o FULL OUTER JOIN new n USING (o_orderkey)
)
SELECT change_type, count(*) AS n_rows
FROM classified WHERE change_type IS NOT NULL
GROUP BY change_type
"""


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler: per-key row counts of ``lineitem.l_suppkey``
    reduced to the distribution summary that decides the join strategy
    (plain shuffle vs AQE skew split vs explicit salting — see
    ``operators.joins.salted_join`` and the SCALE.md skew experiment).
    One combinable groupBy then a single-row aggregate over the (small)
    key-count table; the hottest key is tie-broken to the smallest id.
    """
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_per_key"),
        F.round(F.avg("cnt"), 6).alias("avg_per_key"),
        F.round(F.expr("percentile(cnt, 0.5)"), 6).alias("p50_per_key"),
        F.round(F.expr("percentile(cnt, 0.99)"), 6).alias("p99_per_key"),
        F.round(F.max("cnt") / F.avg("cnt"), 6).alias("skew_ratio"),
    )
    top = (
        counts.join(stats.select("max_per_key"), counts["cnt"] == F.col("max_per_key"))
        .agg(F.min("l_suppkey").alias("hottest_key"))
    )
    return stats.crossJoin(F.broadcast(top))


Q_KEY_SKEW_SQL = """
WITH counts AS (
  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey
), stats AS (
  SELECT count(*) AS n_keys,
    max(cnt) AS max_per_key,
    round(avg(cnt), 6) AS avg_per_key,
    round(quantile_cont(cnt, 0.5), 6) AS p50_per_key,
    round(quantile_cont(cnt, 0.99), 6) AS p99_per_key,
    round(max(cnt) / avg(cnt), 6) AS skew_ratio
  FROM counts
)
SELECT stats.*,
  (SELECT min(l_suppkey) FROM counts, stats WHERE cnt = max_per_key) AS hottest_key
FROM stats
"""


EQUIDEPTH_BINS = 8


def q_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning of ``o_totalprice`` — the
    feature-discretization / range-partition-boundary primitive (the
    histogram twin of ``q_histogram``'s equi-width buckets).

    Scale shape: ntile's exact bucket rule, but the global rank comes
    from the two-phase prefix count (``operators/prefix.py``) instead of
    an unpartitioned ``ntile() OVER (ORDER BY ...)`` window — the
    one-task global sort is the same planner stall the compaction
    planner had (round-3 verdict). The ntile remainder rule (first
    ``N % k`` buckets take one extra row) is reproduced from the rank
    and a 1-row broadcast count, so output is bit-identical to the
    oracle's ntile. Deterministic: the order is keyed
    (o_totalprice, o_orderkey) so ties are totally ordered and bin
    membership is engine-agnostic."""
    from monster_etl_spark.operators.prefix import global_row_number

    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    ranked = global_row_number(
        o, [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()], "rnk"
    )
    n_tot = o.agg(F.count(F.lit(1)).alias("_n"))
    k = F.lit(EQUIDEPTH_BINS)
    base = F.floor(F.col("_n") / k)  # rows per small bucket
    rem = F.col("_n") % k  # first `rem` buckets take base+1 rows
    in_big = F.col("rnk") <= rem * (base + 1)
    bin_col = F.when(in_big, F.floor((F.col("rnk") - 1) / (base + 1)) + 1).otherwise(
        rem + F.floor((F.col("rnk") - 1 - rem * (base + 1)) / base) + 1
    )
    return (
        ranked.crossJoin(F.broadcast(n_tot))
        .withColumn("bin", bin_col.cast("long"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


Q_EQUIDEPTH_SQL = f"""
WITH t AS (
  SELECT o_totalprice,
    ntile({EQUIDEPTH_BINS}) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_rows,
  round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi
FROM t GROUP BY bin
"""


QUERIES = {
    "q_key_skew_profile": QuerySpec(
        q_key_skew_profile, Q_KEY_SKEW_SQL, "join-key skew distribution profile"
    ),
    "q_equidepth_bins": QuerySpec(
        q_equidepth_bins, Q_EQUIDEPTH_SQL, "equi-depth quantile binning (ntile)"
    ),
    "t1_rename_fields": QuerySpec(t1_rename_fields, T1_SQL, "T1 renameFields"),
    "t2_remove_fields": QuerySpec(t2_remove_fields, T2_SQL, "T2 removeFields"),
    "t3_extract_fields": QuerySpec(t3_extract_fields, T3_SQL, "T3 extractFields"),
    "t4_collect_fields": QuerySpec(t4_collect_fields, T4_SQL, "T4 collectFields"),
    "t5_concat_fields": QuerySpec(t5_concat_fields, T5_SQL, "T5 concatFields"),
    "t7_snake_case": QuerySpec(t7_snake_case, T7_SQL, "T6/T7 keysToSnakeCase"),
    "t9_parse_longs": QuerySpec(t9_parse_longs, T9_SQL, "T9 parseLongs .0-strip"),
    "t10_parse_doubles_nan": QuerySpec(t10_parse_doubles_nan, T10_SQL, "T10 parseDoubles + nan"),
    "t11_parse_booleans": QuerySpec(t11_parse_booleans, T11_SQL, "T11 boolean-by-membership"),
    "t12_parse_string_arrays": QuerySpec(t12_parse_string_arrays, T12_SQL, "T12 string arrays"),
    "t13_parse_double_arrays": QuerySpec(t13_parse_double_arrays, T13_SQL, "T13 double arrays + nan"),
    "t15_ensure_arrays": QuerySpec(t15_ensure_arrays, T15_SQL, "T15 ensureArrays"),
    "p2_transform_chain": QuerySpec(p2_transform_chain, P2_SQL, "P2 config-driven chain"),
    "p4_union_dedup": QuerySpec(p4_union_dedup, P4_SQL, "A1+A2 union + distinctBy"),
    "q_salted_join": QuerySpec(q_salted_join, Q_SALTED_SQL, "skew-safe salted join"),
    "q_merge_upsert": QuerySpec(q_merge_upsert, Q_MERGE_SQL, "latest-wins upsert merge"),
    "q_profile": QuerySpec(q_profile, Q_PROFILE_SQL, "one-pass exact data profile"),
    "q_zorder_key": QuerySpec(q_zorder_key, Q_ZORDER_SQL, "Morton z-curve layout key"),
    "q_histogram": QuerySpec(q_histogram, Q_HISTOGRAM_SQL, "equi-width histogram profile"),
    "q_expectations": QuerySpec(q_expectations, Q_EXPECTATIONS_SQL, "data-contract expectations gate"),
    "q_snapshot_diff": QuerySpec(q_snapshot_diff, Q_SNAPSHOT_DIFF_SQL, "CDC diff between snapshots"),
    "t16_path_column": QuerySpec(
        t16_path_column, T16_SQL, "T16 path-derived column (partition-dir round-trip)"
    ),
}


CMS_MIN_COUNT = 75  # ~p85 of the sf0.01 per-user distribution: non-trivial at every sf


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the event stream's user_id
    (operators/sketches.py): d x w = 4 x 512 cells estimate every user's
    event count in bounded memory; users whose estimate reaches the
    threshold are returned with the exact count beside the estimate, so
    the CMS no-underestimate guarantee (estimate >= exact, always) is
    hash-checked row by row. Sketch build shuffles at most
    #partitions * d * w cells (map-side combine); the probe is d
    broadcast joins of the 2k-cell sketch — the cardinality-unbounded
    twin of q_key_skew_profile's exact top-k."""
    from monster_etl_spark.operators.sketches import cms_heavy_hitters

    # spread TRIED and REVERTED (round-11): the round-robin exchange is
    # referenced by both the sketch build and the exact-count subtree, so
    # it materializes an extra full pass — 1.3-1.45x slower on two bench
    # runs (guide §8)
    ev = load(spark, sf_dir, "events")
    return cms_heavy_hitters(ev, "user_id", CMS_MIN_COUNT).select(
        "user_id", "exact_count", "cms_estimate"
    )


def _cms_sql() -> str:
    from monster_etl_spark.operators.sketches import cms_heavy_hitters_sql

    return cms_heavy_hitters_sql("events", "user_id", CMS_MIN_COUNT)


QUERIES["q_heavy_hitters_cms"] = QuerySpec(
    q_heavy_hitters_cms, _cms_sql(), "count-min-sketch heavy hitters with exact audit"
)


COMPACT_TARGET = 1000  # rows per compacted unit (bytes in prod; rows here)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE-style compaction plan (operators/maintenance.py
    ``compaction_plan``): month-grained order partitions are the
    small-file inventory (unit = month, size = row count — the oracle-
    visible stand-in for manifest byte sizes); cumulative-sum binning in
    size-descending order assigns each unit a merge group of ~target
    combined size. In production the same operator runs over
    ``manifest_table`` part-file rows and the groups feed a
    repartition-rewrite; the plan itself is metadata-sized."""
    from monster_etl_spark.operators.maintenance import compaction_plan

    o = load(spark, sf_dir, "orders")
    inv = o.groupBy(
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("part_month")
    ).agg(F.count(F.lit(1)).alias("part_rows"))
    return compaction_plan(inv, "part_month", "part_rows", COMPACT_TARGET)


def _compaction_sql() -> str:
    from monster_etl_spark.operators.maintenance import compaction_plan_sql

    inv = (
        "SELECT strftime(o_orderdate, '%Y-%m') AS part_month, "
        "CAST(COUNT(*) AS BIGINT) AS part_rows FROM orders GROUP BY 1"
    )
    return compaction_plan_sql(inv, "part_month", "part_rows", COMPACT_TARGET)


QUERIES["q_compaction_plan"] = QuerySpec(
    q_compaction_plan, _compaction_sql(), "small-file compaction bin-packing plan"
)


INC_SPLIT = "1997-01-01"  # state = history before, delta = rows at/after


def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/incremental.py
    ``merge_aggregate_states``): a monthly orders aggregate maintained as
    distributive states (count / decimal sum / min / max), where the
    pre-split history aggregate and the post-split delta aggregate are
    merged WITHOUT rescanning history — union + one groupBy on 2x group
    cardinality. avg is derived from the merged states. The oracle
    aggregates the full table directly, pinning that merge(state(A),
    state(B)) == state(A union B) exactly (decimal sums make the merge
    order bitwise-irrelevant)."""
    from monster_etl_spark.operators.incremental import merge_aggregate_states

    o = load(spark, sf_dir, "orders").withColumn(
        "order_month", F.date_format(F.col("o_orderdate"), "yyyy-MM")
    )

    def month_state(df: DataFrame) -> DataFrame:
        return df.groupBy("order_month").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("sum_total"),
            F.min("o_totalprice").alias("min_total"),
            F.max("o_totalprice").alias("max_total"),
        )

    state = month_state(o.filter(F.col("o_orderdate") < F.lit(INC_SPLIT)))
    delta = month_state(o.filter(F.col("o_orderdate") >= F.lit(INC_SPLIT)))
    merged = merge_aggregate_states(
        state,
        delta,
        ["order_month"],
        {"n_orders": "count", "sum_total": "sum", "min_total": "min", "max_total": "max"},
    )
    return merged.select(
        "order_month",
        "n_orders",
        F.col("sum_total").cast("double").alias("sum_total"),
        "min_total",
        "max_total",
        F.round(F.col("sum_total").cast("double") / F.col("n_orders"), 6).alias("avg_total"),
    )


Q_INC_MERGE_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       MIN(o_totalprice) AS min_total,
       MAX(o_totalprice) AS max_total,
       round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_total
FROM orders
GROUP BY 1
"""

QUERIES["q_incremental_agg_merge"] = QuerySpec(
    q_incremental_agg_merge,
    Q_INC_MERGE_SQL,
    "incremental aggregate-state merge == full recompute (IVM contract)",
)


PSI_BINS = 10
PSI_SPLIT = "1997-01-01"


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the pre/post-split order-value
    distributions — the standard drift monitor ("did this feature's
    distribution move?") run as two scans and a 10-row join. Bins are
    equi-width over the REFERENCE window's [min, max] (the q_histogram
    rule: nullif-guarded width, overflow clamped into the top bin, cur
    rows below/above the ref range clamp to the edge bins); bin shares
    are Laplace-smoothed (+1 / +bins) so empty bins cannot produce
    log(0); psi_total repeats per row (window sum over the 10-row
    frame). PSI > 0.2 is the conventional 'investigate' threshold."""
    o = load(spark, sf_dir, "orders")
    ref = o.filter(F.col("o_orderdate") < F.lit(PSI_SPLIT))
    cur = o.filter(F.col("o_orderdate") >= F.lit(PSI_SPLIT))
    edges = ref.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )

    def binned(df: DataFrame, name: str) -> DataFrame:
        width = F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0)) / PSI_BINS
        b = F.least(
            F.greatest(
                F.coalesce(
                    F.floor((F.col("o_totalprice") - F.col("mn")) / width) + 1, F.lit(1)
                ),
                F.lit(1),
            ),
            F.lit(PSI_BINS),
        ).cast("long")
        return (
            df.crossJoin(F.broadcast(edges))
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    from pyspark.sql import Window

    bins = spark.range(1, PSI_BINS + 1).select(F.col("id").alias("bin"))
    r = binned(ref, "n_ref")
    c = binned(cur, "n_cur")
    # totals derive from the bin counts (every row clamps into some bin),
    # so no extra full scans and no driver-side .count() actions
    w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    joined = (
        bins.join(F.broadcast(r), "bin", "left")
        .join(F.broadcast(c), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .withColumn(
            "p_ref",
            (F.col("n_ref") + 1) / (F.sum("n_ref").over(w) + PSI_BINS).cast("double"),
        )
        .withColumn(
            "p_cur",
            (F.col("n_cur") + 1) / (F.sum("n_cur").over(w) + PSI_BINS).cast("double"),
        )
        .withColumn(
            "psi_term",
            F.round((F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref")), 6),
        )
    )
    return joined.select(
        "bin",
        "n_ref",
        "n_cur",
        "psi_term",
        F.round(F.sum("psi_term").over(w), 6).alias("psi_total"),
    )


Q_DRIFT_PSI_SQL = f"""
WITH edges AS (
  SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx
  FROM orders WHERE o_orderdate < TIMESTAMP '{PSI_SPLIT} 00:00:00'
),
ref AS (
  SELECT CAST(least(greatest(coalesce(
           floor((o_totalprice - mn) / (nullif(mx - mn, 0.0) / {PSI_BINS})) + 1, 1), 1), {PSI_BINS}) AS BIGINT) AS bin
  FROM orders, edges WHERE o_orderdate < TIMESTAMP '{PSI_SPLIT} 00:00:00'
),
cur AS (
  SELECT CAST(least(greatest(coalesce(
           floor((o_totalprice - mn) / (nullif(mx - mn, 0.0) / {PSI_BINS})) + 1, 1), 1), {PSI_BINS}) AS BIGINT) AS bin
  FROM orders, edges WHERE o_orderdate >= TIMESTAMP '{PSI_SPLIT} 00:00:00'
),
rb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_ref FROM ref GROUP BY bin),
cb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_cur FROM cur GROUP BY bin),
bins AS (SELECT unnest(range(1, {PSI_BINS + 1})) AS bin),
j AS (
  SELECT bins.bin,
         coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur,
         (coalesce(n_ref, 0) + 1) / CAST(SUM(coalesce(n_ref, 0)) OVER () + {PSI_BINS} AS DOUBLE) AS p_ref,
         (coalesce(n_cur, 0) + 1) / CAST(SUM(coalesce(n_cur, 0)) OVER () + {PSI_BINS} AS DOUBLE) AS p_cur
  FROM bins LEFT JOIN rb ON bins.bin = rb.bin LEFT JOIN cb ON bins.bin = cb.bin
),
t AS (SELECT bin, n_ref, n_cur, round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term FROM j)
SELECT bin, n_ref, n_cur, psi_term,
       round(SUM(psi_term) OVER (), 6) AS psi_total
FROM t
"""

QUERIES["q_drift_psi"] = QuerySpec(
    q_drift_psi, Q_DRIFT_PSI_SQL, "population-stability-index drift monitor between snapshots"
)
