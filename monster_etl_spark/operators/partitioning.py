"""Partitioning helpers shared across operators.

At 100 TB inputs arrive as thousands of splits and these are no-ops; on a
small single-file corpus they keep a pipeline from serializing onto one
core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin to ``defaultParallelism`` partitions when the input has
    fewer — engages every core without changing semantics. No-op (returns
    the input unchanged) when the source is already well-partitioned."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
