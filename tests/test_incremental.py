"""Partition-wise backfill idempotence + compaction."""

import glob

from pyspark.sql import functions as F

from monster_etl_spark.operators.incremental import compact, incremental_backfill, list_partitions


def _write_day(spark, path, day, n):
    df = spark.range(n).select(
        F.col("id"),
        F.lit(day).alias("day"),
        (F.col("id") * 2).alias("value"),
    )
    df.write.mode("append").partitionBy("day").parquet(path)


def test_backfill_processes_only_missing(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _write_day(spark, src, "2024-01-01", 10)
    _write_day(spark, src, "2024-01-02", 20)

    done = incremental_backfill(spark, src, dst, "day", lambda df: df.withColumn("v2", F.col("value") + 1))
    assert done == ["2024-01-01", "2024-01-02"]
    assert list_partitions(dst, "day") == {"2024-01-01", "2024-01-02"}

    # idempotent: nothing new to do
    assert incremental_backfill(spark, src, dst, "day") == []

    # a new source day appears -> only that one is processed
    _write_day(spark, src, "2024-01-03", 5)
    assert incremental_backfill(spark, src, dst, "day", lambda df: df.withColumn("v2", F.col("value") + 1)) == ["2024-01-03"]

    out = spark.read.parquet(dst)
    assert out.count() == 35
    assert out.filter("v2 != value + 1").count() == 0


def test_compact_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(1000).repartition(8).write.parquet(path)
    n_before = len(glob.glob(f"{path}/part-*"))
    assert n_before == 8
    reported = compact(spark, path, target_files=1)
    assert reported == 8
    assert len(glob.glob(f"{path}/part-*")) == 1
    assert spark.read.parquet(path).count() == 1000
    # swap leaves no scratch dirs behind
    assert glob.glob(f"{path}.compact-*") == []


def test_snapshot_diff_null_transitions(spark):
    """NULL -> value and value -> NULL must register as 'changed' (the
    naive equality formulation misses them)."""
    from monster_etl_spark.operators.incremental import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, "same"), (4, "gone")], "k: long, v: string"
    )
    new = spark.createDataFrame(
        [(1, "now"), (2, None), (3, "same"), (5, "fresh")], "k: long, v: string"
    )
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "changed", 2: "changed", 4: "deleted", 5: "inserted"}


def test_merge_aggregate_states_equals_full_recompute(spark):
    import pyspark.sql.functions as F

    from monster_etl_spark.operators.incremental import merge_aggregate_states

    rows = [(i % 3, float(i), 1) for i in range(30)]
    df = spark.createDataFrame(rows, "k: int, v: double, one: int")

    def state(d):
        return d.groupBy("k").agg(
            F.sum("one").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    merged = merge_aggregate_states(
        state(df.filter("v < 15")), state(df.filter("v >= 15")),
        ["k"], {"n": "count", "s": "sum", "mn": "min", "mx": "max"},
    )
    full = state(df)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def test_merge_aggregate_states_rejects_unknown_kind(spark):
    import pytest as _pt

    from monster_etl_spark.operators.incremental import merge_aggregate_states

    df = spark.range(1).selectExpr("id AS k", "id AS a")
    with _pt.raises(ValueError):
        merge_aggregate_states(df, df, ["k"], {"a": "avg"})
