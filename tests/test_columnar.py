"""Columnar source/sink roundtrips + writer knobs."""

import glob

import pytest

from monster_etl_spark.sources.columnar import (
    avro_available,
    read_avro,
    read_csv,
    read_orc,
    read_parquet,
    write_columnar,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return read_parquet(spark, f"{sf_dir}/orders.parquet")


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_columnar_roundtrip(spark, orders, tmp_path, fmt):
    out = str(tmp_path / fmt)
    write_columnar(orders, out, fmt=fmt, sort_within_partitions=["o_orderkey"])
    back = read_parquet(spark, out) if fmt == "parquet" else read_orc(spark, out)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    assert sorted(r["o_orderkey"] for r in back.select("o_orderkey").collect()) == sorted(
        r["o_orderkey"] for r in orders.select("o_orderkey").collect()
    )


def test_partitioned_write_and_file_cap(spark, orders, tmp_path):
    out = str(tmp_path / "parts")
    write_columnar(orders, out, partition_by=["o_orderstatus"], max_records_per_file=200)
    dirs = glob.glob(f"{out}/o_orderstatus=*")
    assert len(dirs) == 3
    # file cap respected: every part file <= 200 records
    for f in glob.glob(f"{out}/o_orderstatus=*/part-*.parquet"):
        assert read_parquet(spark, f).count() <= 200


def test_csv_roundtrip(spark, orders, tmp_path):
    out = str(tmp_path / "csv")
    orders.limit(50).write.option("header", True).csv(out)
    back = read_csv(spark, out, inferSchema="true")
    assert back.count() == 50
    assert set(back.columns) == set(orders.columns)


def test_avro_gated(spark, tmp_path):
    # spark-avro is an external jar; without it read_avro must DISPATCH to
    # the pure-stdlib OCF fallback (sources/avro_py), not fail — and a
    # missing path must surface as a clean path error on either engine
    if avro_available(spark):
        pytest.skip("avro present; gating path not exercised")
    import json

    from pyspark.errors.exceptions.captured import AnalysisException

    from monster_etl_spark.sources.avro_py import avro_write_blob

    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "k", "type": "long"}],
    }
    p = tmp_path / "one.avro"
    p.write_bytes(avro_write_blob(json.loads(json.dumps(schema)), [{"k": 7}], "null"))
    assert [r["k"] for r in read_avro(spark, str(p)).collect()] == [7]
    with pytest.raises(AnalysisException):
        read_avro(spark, "/tmp/nope-does-not-exist.avro")


def test_overwrite_partitions_touches_only_written_keys(spark, tmp_path):
    """Dynamic overwrite must replace exactly the partitions present in
    the incoming frame; static overwrite would truncate the table."""
    from monster_etl_spark.sources.columnar import overwrite_partitions

    out = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-02", 2, "b"), ("2024-01-03", 3, "c")],
        "day: string, id: long, v: string",
    )
    overwrite_partitions(base, out, ["day"])

    # restate ONE day with different content
    fix = spark.createDataFrame(
        [("2024-01-02", 20, "B-fixed")], "day: string, id: long, v: string"
    )
    overwrite_partitions(fix, out, ["day"])

    # partition-column values come back type-inferred (date), stringify
    got = {
        (str(r["day"]), r["id"], r["v"]) for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("2024-01-01", 1, "a"),
        ("2024-01-02", 20, "B-fixed"),
        ("2024-01-03", 3, "c"),
    }, got
    # conf restored to its prior value
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper() == "STATIC"


def test_orc_partition_pruning_and_pushdown(spark, orders, tmp_path):
    """The s9 registry shape: lang-style partitioned ORC write, pruned
    read. The physical scan must show (a) partition filters — pruning
    happens at planning, non-matching directories are never listed into
    tasks — and (b) the non-partition predicate pushed to the ORC reader."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "orc_parts")
    orders.limit(500).write.mode("overwrite").partitionBy("o_orderstatus").orc(out)
    df = read_orc(spark, out).filter(
        (F.col("o_orderstatus") != "F") & (F.col("o_totalprice") > 1000.0)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]
    # and the values really are pruned/filtered
    got = df.select("o_orderstatus").distinct().collect()
    assert all(r["o_orderstatus"] != "F" for r in got)
