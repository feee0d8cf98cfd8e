"""Columnar and generic-delimited sources/sinks beyond the reference's
TSV/JSON-lines surface: Parquet and ORC (built into Spark), generic CSV
with options, and Avro gated behind availability (the spark-avro package is
an external jar and may be absent).

Writer posture for scale: explicit compression, optional partition columns
(Hive layout -> partition pruning for readers), optional
``max_records_per_file`` to bound output file sizes, and
``sort_within_partitions`` so parquet/ORC row-group min-max stats are tight
enough for predicate skipping on the sorted key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_parquet(spark: SparkSession, path: str, **options: str) -> DataFrame:
    return spark.read.options(**options).parquet(path)


def read_orc(spark: SparkSession, path: str, **options: str) -> DataFrame:
    return spark.read.options(**options).orc(path)


def read_csv(
    spark: SparkSession, path: str, sep: str = ",", header: bool = True, **options: str
) -> DataFrame:
    return (
        spark.read.option("sep", sep)
        .option("header", header)
        .options(**options)
        .csv(path)
    )


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro data source is on the classpath."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
    except Exception as exc:  # noqa: BLE001
        return "FAILED_FIND_AVRO_DATA_SOURCE" not in str(exc) and "Failed to find data source: avro" not in str(exc)
    return True


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro is not on the classpath in this environment; "
            "add org.apache.spark:spark-avro via spark.jars.packages"
        )
    return spark.read.format("avro").load(path)


def write_columnar(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str = "snappy",
    partition_by: Sequence[str] = (),
    sort_within_partitions: Sequence[str] = (),
    max_records_per_file: int | None = None,
) -> None:
    """Scale-aware columnar writer (parquet/orc)."""
    if sort_within_partitions:
        df = df.sortWithinPartitions(*sort_within_partitions)
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unknown columnar format {fmt!r}")


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    fmt: str = "parquet",
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present in
    ``df``, leaving every other partition of the target untouched — the
    incremental-rewrite primitive (backfill a day, restate a region)
    that static overwrite mode gets catastrophically wrong by truncating
    the whole table first. Implemented with Spark's
    ``partitionOverwriteMode=dynamic`` session conf, set for the single
    write and restored afterward (the static default is the safer
    global)."""
    if not partition_by:
        raise ValueError("overwrite_partitions requires at least one partition column")
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "dynamic")
    try:
        writer = df.write.mode("overwrite").partitionBy(*partition_by)
        if fmt == "parquet":
            writer.parquet(path)
        elif fmt == "orc":
            writer.orc(path)
        else:
            raise ValueError(f"unknown columnar format {fmt!r}")
    finally:
        spark.conf.set(key, prev)
