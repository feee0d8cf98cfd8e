"""Partitioning helpers shared across operators.

At 100 TB inputs arrive as thousands of splits and these are no-ops; on a
small single-file corpus they keep a pipeline from serializing onto one
core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# (applicationId, analyzed-plan semanticHash) -> partition count.
# The probe (`df.rdd.getNumPartitions()`) physically plans the probed
# subtree just to read one integer — ~50-90 ms of driver time per call,
# paid on EVERY plan build because builds mint fresh DataFrames
# (round-11 cProfile). The count is deterministic per analyzed plan
# within a session ASSUMING STATIC INPUTS (if the underlying files
# changed mid-session the memo would go stale — harmless for spread():
# worst case a redundant or missing repartition, perf-only, never
# correctness) and fixed session confs, so it is plan METADATA —
# memoizing it is the probe-side twin of the reader's schema memo, not
# result caching: every action still scans parquet.
_NPART_MEMO: dict = {}


def _num_partitions(df: DataFrame) -> int:
    try:
        qe = df._jdf.queryExecution()
        key = (
            df.sparkSession.sparkContext.applicationId,
            qe.analyzed().semanticHash(),
        )
    except Exception:
        return df.rdd.getNumPartitions()
    n = _NPART_MEMO.get(key)
    if n is None:
        # queryExecution().toRdd() skips df.rdd's javaToPython conversion
        # (a second QueryExecution + serializer wrap) — same integer
        n = qe.toRdd().getNumPartitions()
        _NPART_MEMO[key] = n
    return n


def spread(df: DataFrame) -> DataFrame:
    """Round-robin to ``defaultParallelism`` partitions when the input has
    fewer — engages every core without changing semantics. No-op (returns
    the input unchanged) when the source is already well-partitioned."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if _num_partitions(df) < target:
        return df.repartition(target)
    return df
