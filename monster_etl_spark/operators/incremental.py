"""Incremental processing utilities: partition-wise backfill and
small-file compaction.

``incremental_backfill`` is the idempotent daily-pipeline shape: compare
source vs destination Hive partitions, process only the missing ones, and
write each with dynamic partition overwrite so a re-run of a partition
replaces exactly that partition. At 100 TB this is the difference between
reprocessing a day and reprocessing a lake.

``compact`` rewrites a directory to a bounded file count — the antidote to
small-file accumulation from streaming/incremental writers (parquet
readers pay per-file open cost; metadata pressure grows per file).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from monster_etl_spark import fsutil


def list_partitions(path: str, partition_col: str, spark: SparkSession | None = None) -> set[str]:
    """Partition values present under ``path`` (Hive layout) — via the
    Hadoop FS API when a session is passed, so discovery works on object
    stores; local glob fallback otherwise."""
    out = set()
    for d in fsutil.list_dirs(spark, path, f"{partition_col}=*"):
        m = re.search(rf"{re.escape(partition_col)}=([^/]+)/?$", d)
        if m:
            out.add(m.group(1))
    return out


def incremental_backfill(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    partition_col: str,
    transform: Callable[[DataFrame], DataFrame] = lambda df: df,
    fmt: str = "parquet",
) -> list[str]:
    """Process only source partitions missing from the destination.

    Reads each missing partition with a partition-pruned scan, applies
    ``transform``, writes it under the same Hive layout. Returns the list
    of processed partition values (empty = already up to date). Idempotent:
    re-running processes nothing new.
    """
    missing = sorted(
        list_partitions(src_path, partition_col, spark)
        - list_partitions(dst_path, partition_col, spark)
    )
    if not missing:
        return []
    src = spark.read.format(fmt).load(src_path)
    # dynamic partition overwrite: re-writing a partition REPLACES it (the
    # idempotency contract) instead of appending duplicates. Recovery from a
    # crash mid-write: delete the suspect partition dir and re-run — tested
    # in tests/test_incremental.py.
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        for value in missing:
            part = src.filter(F.col(partition_col) == value)
            out = transform(part)
            (
                out.write.mode("overwrite")
                .partitionBy(partition_col)
                .format(fmt)
                .save(dst_path)
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return missing


def compact(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    fmt: str = "parquet",
) -> int:
    """Rewrite a directory to ``target_files`` files (coalesce — a narrow
    repartitioning; use a higher target to keep write parallelism). Returns
    the file count before compaction. Distributed end to end: writes to a
    temp dir and swaps, never reading and overwriting one path in a job.

    The swap is retire-then-replace (target -> .old, tmp -> target,
    delete .old): the target path is missing only for the instant between
    the two renames, not for the duration of a directory delete. Not
    transactional — a concurrent reader can still race the rename window;
    a table format (Iceberg/Delta) is the real fix at scale."""
    before = len(fsutil.list_files(spark, path, "part-*"))
    # write-to-tmp + swap keeps the rewrite distributed (no driver
    # materialization) and never overwrites the directory being read
    tmp = path.rstrip("/") + ".compact-tmp"
    spark.read.format(fmt).load(path).coalesce(target_files).write.mode(
        "overwrite"
    ).format(fmt).save(tmp)
    old = path.rstrip("/") + ".compact-old"
    fsutil.delete(spark, old)
    fsutil.rename(spark, path, old)
    fsutil.rename(spark, tmp, path)
    fsutil.delete(spark, old)
    return before


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-feed between two table snapshots: (key, change_type)
    with change_type in {inserted, deleted, changed} (unchanged rows are
    omitted — the useful output is the delta). One full-outer equi-join
    on the key; change detection hashes the compared columns JVM-side
    (null-safe: a hash over coalesced markers, not column equality, so
    NULL -> value transitions register as changes). The audit pass of an
    incremental pipeline — run per partition at 100 TB, exactly like
    compact()."""
    cols = compare_cols or [c for c in new.columns if c != key]

    def content(df: DataFrame) -> Column:
        return F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols]
        )

    o = old.select(F.col(key).alias("k"), content(old).alias("h_old"))
    n = new.select(F.col(key).alias("k"), content(new).alias("h_new"))
    j = o.join(n, "k", "full_outer")
    return (
        j.select(
            F.col("k").alias(key),
            F.when(F.col("h_old").isNull(), F.lit("inserted"))
            .when(F.col("h_new").isNull(), F.lit("deleted"))
            .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
            .alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


# Aggregate-state columns understood by merge_aggregate_states: suffix ->
# re-combine function. avg is NOT a state (derive it as sum/count after
# merging) — the classic incremental-view-maintenance rule.
_MERGE_FNS = {
    "sum": F.sum,
    "count": F.sum,  # counts add
    "min": F.min,
    "max": F.max,
}


def merge_aggregate_states(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    columns: dict[str, str],
) -> DataFrame:
    """Incremental view maintenance for distributive aggregates: combine
    an existing per-key aggregate table with the same aggregation of a
    new delta, WITHOUT rescanning history. ``columns`` maps column name
    -> state kind ('sum' | 'count' | 'min' | 'max'); both inputs must
    carry exactly (keys + columns). Algebraic aggregates (avg, stddev)
    are derived from these states after the merge — never stored.

    Union + one groupBy on the keys: shuffle volume is 2x the group
    cardinality, independent of how much history the state summarizes.
    Exactness: run sums in DECIMAL state (the engine-wide discipline) so
    merge order cannot change a bit; holistic aggregates (exact median)
    do not fit this contract and need the full data by definition.
    """
    for c, kind in columns.items():
        if kind not in _MERGE_FNS:
            raise ValueError(f"unsupported state kind {kind!r} for {c!r}")
    u = state.select(*keys, *columns).unionByName(delta.select(*keys, *columns))
    return u.groupBy(*keys).agg(
        *[_MERGE_FNS[kind](c).alias(c) for c, kind in columns.items()]
    )
