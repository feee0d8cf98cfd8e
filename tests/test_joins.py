"""Salted-join equivalence + bucketed co-located join plan tests."""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from monster_etl_spark.operators.joins import salted_join, write_bucketed


def _explain(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = l.join(o, "l_orderkey").groupBy("o_orderstatus").count()
    salted = salted_join(l, o, "l_orderkey").groupBy("o_orderstatus").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "v"])
    small = spark.createDataFrame([(1, "X"), (2, "Y")], ["k", "w"])
    out = salted_join(big, small, "k", salt_factor=4, how="left").collect()
    got = sorted((r["k"], r["v"], r["w"]) for r in out)
    assert got == [(1, "a", "X"), (1, "b", "X"), (2, "c", "Y"), (3, "d", None)]


def test_salted_join_is_deterministic(spark, sf_dir):
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_linenumber")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    a = sorted(map(tuple, salted_join(l, o, "l_orderkey").collect()))
    b = sorted(map(tuple, salted_join(l, o, "l_orderkey").collect()))
    assert a == b


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # default warehouse dir (spark.sql.warehouse.dir is static config);
    # tables are dropped — and their files removed — on teardown
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_totalprice")
    write_bucketed(l, "lineitem_b", "l_orderkey", 8)
    write_bucketed(o, "o_orders_b", "o_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS o_orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    l = spark.table("lineitem_b")
    o = spark.table("o_orders_b")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, l.l_orderkey == o.o_orderkey)
        plan = _explain(joined)
        assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 0, (
            "bucketed co-located join must not shuffle"
        )
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_asof_merge_matches_range_join_form(spark, sf_dir):
    from monster_etl_spark.queries.relational_queries import (
        q_asof_last_order,
        q_asof_merge_join,
    )

    a = {tuple(r) for r in q_asof_last_order(spark, sf_dir).collect()}
    b = {tuple(r) for r in q_asof_merge_join(spark, sf_dir).collect()}
    assert a == b


def test_asof_merge_plan_has_no_join(spark, sf_dir):
    """The merge form's whole point: one union + one window shuffle,
    never a join-expansion of |matches| rows."""
    from monster_etl_spark.queries.relational_queries import q_asof_merge_join

    plan = _explain(q_asof_merge_join(spark, sf_dir))
    assert re.search(r"Join", plan) is None, plan[:2000]
    assert re.search(r"Window", plan) is not None


def test_asof_merge_tied_right_rows_deterministic(spark):
    """Two right rows tied on (key, ts) with different carried values:
    the running last must pick the greatest value tuple, independent of
    partition layout (the window orders by the value tuple after
    (ts, side))."""
    from monster_etl_spark.operators.joins import asof_join_merge

    left = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "k: long, ts: string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10), (1, "2024-01-01 00:00:00", 99)],
        "k: long, rts: string, v: int",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP_NTZ) AS rts", "v")
    for parts in (1, 7):
        out = asof_join_merge(
            left, right.repartition(parts), "k", "k", "ts", "rts",
            value_cols=["v"], count_col="n",
        ).collect()
        assert len(out) == 1 and out[0].v == 99 and out[0].n == 2


def test_asof_merge_null_right_ts_never_matches(spark):
    """A right row with a NULL timestamp can never satisfy r.ts <= l.ts;
    it must be dropped, not sorted-first-and-carried-everywhere
    (round-3 ADVICE). A left row with a NULL timestamp matches nothing:
    NULL values, count 0."""
    from monster_etl_spark.operators.joins import asof_join_merge

    left = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00"), (1, None)], "k: long, ts: string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    right = spark.createDataFrame(
        [(1, None, 777), (1, "2024-01-01 00:00:00", 10)],
        "k: long, rts: string, v: int",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP_NTZ) AS rts", "v")
    out = {
        (r.ts is not None, r.v, r.n)
        for r in asof_join_merge(
            left, right, "k", "k", "ts", "rts", value_cols=["v"], count_col="n"
        ).collect()
    }
    # non-null left row carries the real 10, NEVER the null-ts 777;
    # null-ts left row carries nothing
    assert out == {(True, 10, 1), (False, None, 0)}


def test_asof_merge_multi_value_cols_tie_break_on_original_tuple(spark):
    """With several value_cols, every running-last must tie-break on the
    ORIGINAL right-side value tuple (round-3 ADVICE: a withColumn loop
    re-resolved earlier columns against their already-filled
    replacements). Regression shape: an EARLIER right row (v1=7) fills
    tied NULL-v1 rows at ts1 to 7, which under the buggy loop reorders
    the ts1 ties for v2's window — (NULL,1),(NULL,2),(5,9) becomes
    (5,9),(7,1),(7,2), carrying v2=2 from a DIFFERENT row than v1. The
    greatest original tuple among the ts1 ties is (5,9); both carried
    columns must come from that same row."""
    from monster_etl_spark.operators.joins import asof_join_merge

    left = spark.createDataFrame(
        [(1, "2024-01-02 00:00:00")], "k: long, ts: string"
    ).selectExpr("k", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, 0),
            (1, "2024-01-01 12:00:00", None, 1),
            (1, "2024-01-01 12:00:00", None, 2),
            (1, "2024-01-01 12:00:00", 5, 9),
        ],
        "k: long, rts: string, v1: int, v2: int",
    ).selectExpr("k", "CAST(rts AS TIMESTAMP_NTZ) AS rts", "v1", "v2")
    for parts in (1, 7):
        out = asof_join_merge(
            left, right.repartition(parts), "k", "k", "ts", "rts",
            value_cols=["v1", "v2"], count_col="n",
        ).collect()
        assert len(out) == 1
        assert (out[0].v1, out[0].v2, out[0].n) == (5, 9, 4)
