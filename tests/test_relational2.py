"""Sanity bounds for the rows-only approximate aggregates."""

from pyspark.sql import functions as F

from monster_etl_spark.queries import all_queries, load


def test_approx_distinct_within_hll_error(spark, sf_dir):
    approx = {
        r["l_returnflag"]: (r["approx_orders"], r["approx_parts"])
        for r in all_queries()["q_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["o"], r["p"])
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("o"), F.count_distinct("l_partkey").alias("p"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for flag, (ao, ap) in approx.items():
        eo, ep = exact[flag]
        # default rsd is 5%; allow 3 sigma
        assert abs(ao - eo) <= max(3, 0.15 * eo)
        assert abs(ap - ep) <= max(3, 0.15 * ep)
