"""Two-phase global prefix sums and ranks — never a single-task window.

``row_number()/sum() OVER (ORDER BY ...)`` with no PARTITION BY funnels
every row through one task (``WindowExec: No Partition Defined``) — a
planner stall the moment the input is corpus-sized. The classic
distributed fix is a two-phase prefix scan:

1. ``repartitionByRange`` on the window order splits the input into
   ``num_ranges`` ORDER-CONSISTENT slices (every row in slice i sorts
   before every row in slice j > i). The explicit partition count keeps
   AQE from re-coalescing the exchange, and RangePartitioner's boundary
   sampling is deterministically seeded from the input lineage — so every
   branch that re-derives the slicing sees the same slice map.
2. each slice computes its local running aggregate in parallel;
3. per-slice totals (``num_ranges`` rows — bounded by the knob, not the
   input) roll into broadcast offsets; ``offset + local`` equals the
   global prefix exactly.

Integer arithmetic end to end, so the result is bit-identical to the
one-window form at any slicing (pinned by randomized tests against the
single-window oracle). The reference engine has no window machinery at
all (SURVEY.md §2.3); this module exists for the 100 TB posture of the
maintenance/curation operators built on top.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _resolve_num_ranges(df: DataFrame, num_ranges: int | None) -> int:
    if num_ranges is not None:
        return num_ranges
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "64"))
    except ValueError:  # e.g. "auto" under some AQE configs
        return 64


def prefix_sum(
    df: DataFrame,
    order: list[Column],
    value: Column,
    out_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global prefix sum of ``value`` over the total order
    ``order`` (sum over strictly-preceding rows; 0 for the first row),
    bit-identical to ``sum(value) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING TO 1 PRECEDING)`` but computed as a two-phase scan.
    ``order`` must be a total order (include a unique tie-break column);
    adds ``out_col`` to the input columns."""
    num_ranges = _resolve_num_ranges(df, num_ranges)
    in_cols = df.columns
    ranged = df.repartitionByRange(num_ranges, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_pid").orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    )
    # the rollup window IS single-task by design: its input is the
    # num_ranges-row per-slice totals — bounded by the knob, never by
    # the input (whitelisted in the unpartitioned-window audit)
    off_w = Window.orderBy(F.col("_pid").asc()).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum(value).alias("_range_sum"))
        .select(
            "_pid",
            F.coalesce(F.sum("_range_sum").over(off_w), F.lit(0)).alias("_offset"),
        )
    )
    return (
        ranged.withColumn("_local", F.coalesce(F.sum(value).over(local_w), F.lit(0)))
        .join(F.broadcast(offsets), "_pid")
        .select(*in_cols, (F.col("_offset") + F.col("_local")).alias(out_col))
    )


def global_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str = "row_num",
    num_ranges: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank over the total order ``order`` —
    ``row_number() OVER (ORDER BY ...)`` as a two-phase prefix count."""
    ranked = prefix_sum(df, order, F.lit(1), out_col, num_ranges)
    return ranked.withColumn(out_col, (F.col(out_col) + 1).cast("long"))
