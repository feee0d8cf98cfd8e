"""Sanity bounds for the approximate aggregates: the HLL estimates must
satisfy their error contract against independently-computed exact counts
(the registry query asserts the same contract as booleans; this test
recomputes both sides from scratch so a vacuous query can't self-certify)."""

from pyspark.sql import functions as F

from monster_etl_spark.operators.partitioning import spread as _spread
from monster_etl_spark.queries import all_queries, load


def test_approx_distinct_within_hll_error(spark, sf_dir):
    out = {
        r["l_returnflag"]: r
        for r in all_queries()["q_approx_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: (r["o"], r["p"])
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count_distinct("l_orderkey").alias("o"), F.count_distinct("l_partkey").alias("p"))
        .collect()
    }
    assert out.keys() == exact.keys()
    for flag, r in out.items():
        eo, ep = exact[flag]
        assert (r["exact_orders"], r["exact_parts"]) == (eo, ep)
        assert r["approx_orders_within_bounds"] is True
        assert r["approx_parts_within_bounds"] is True


def test_raw_hll_estimates_track_exact(spark, sf_dir):
    # the raw estimates themselves (not just the contract booleans)
    l = _spread(load(spark, sf_dir, "lineitem"))
    row = l.agg(
        F.approx_count_distinct("l_orderkey", 0.05).alias("a"),
        F.count_distinct("l_orderkey").alias("e"),
    ).first()
    assert abs(row["a"] - row["e"]) <= max(3, 0.15 * row["e"])
