"""Table-maintenance operators: upsert merges and data profiling.

``merge_upsert`` is the batch MERGE-INTO shape (no transactional table
format in scope, so the merge is expressed relationally and the caller
rewrites the target): combine current rows and updates, keep the winner
per key by a precedence column. One window shuffle on the key; at scale
this is the compaction pass of an incremental ingest.

``profile`` is the one-pass data-quality summary (row count, null counts,
approx distincts, min/max) — a single aggregate, map-side combinable, no
matter how many columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str,
    precedence: str,
    prefer_updates_on_tie: bool = True,
) -> DataFrame:
    """Latest-wins merge: one row per key, highest ``precedence`` value
    survives; ties go to the updates side when ``prefer_updates_on_tie``.
    Schemas must union by name (missing columns null-filled).
    """
    t = target.withColumn("__src__", F.lit(0))
    u = updates.withColumn("__src__", F.lit(1))
    merged = t.unionByName(u, allowMissingColumns=True)
    # final content-hash tiebreak: two same-key same-precedence rows within
    # one side would otherwise get shuffle-order-dependent row_numbers
    content = F.xxhash64(*[F.col(c) for c in merged.columns if c != "__src__"])
    order = [
        F.desc(precedence),
        F.desc("__src__") if prefer_updates_on_tie else F.asc("__src__"),
        content.asc(),
    ]
    w = Window.partitionBy(key).orderBy(*order)
    return (
        merged.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "__src__")
    )


def profile(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """One-row profile: total count plus per-column null count, approximate
    distinct count, and min/max (min/max for orderable types only).
    Single aggregate pass — cost is one scan regardless of column count."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{f.name}__nulls"))
        aggs.append(F.approx_count_distinct(f.name, approx_rsd).alias(f"{f.name}__approx_distinct"))
        if f.dataType.simpleString() not in ("binary",) and not f.dataType.simpleString().startswith(
            ("array", "map", "struct")
        ):
            aggs.append(F.min(f.name).alias(f"{f.name}__min"))
            aggs.append(F.max(f.name).alias(f"{f.name}__max"))
    return df.agg(*aggs)


def exact_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Exact-distinct variant for designated columns (oracle-checkable;
    count_distinct shuffles per column, so keep the list short)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for name in columns:
        c = F.col(name)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{name}__nulls"))
        aggs.append(F.count_distinct(c).alias(f"{name}__distinct"))
        aggs.append(F.min(name).alias(f"{name}__min"))
        aggs.append(F.max(name).alias(f"{name}__max"))
    return df.agg(*aggs)


def zorder_key(
    cols: list[str],
    mins: dict[str, Column],
    maxs: dict[str, Column],
    bits: int = 8,
) -> Column:
    """Morton (Z-curve) key over ``cols``: each column is scaled to a
    ``bits``-bit integer inside its [min, max] range, then the bit planes
    are interleaved (column j contributes bit position ``b * ncols + j``).
    Rows close in every dimension land close on the curve, so a file
    layout sorted by this key gets NARROW per-file min/max ranges on ALL
    participating columns at once — multi-dimensional data skipping from
    ordinary parquet column statistics, no table format needed.

    Pure integer column arithmetic (scale, shift, mask, add) —
    whole-stage-codegen friendly, ``bits * ncols`` terms. Nulls scale to
    slot 0 (sorted first, deterministic).
    """
    ncols = len(cols)
    slots = (1 << bits) - 1
    z: Column = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        span = F.nullif(
            maxs[c].cast("double") - mins[c].cast("double"), F.lit(0.0)
        )
        scaled = F.coalesce(
            F.floor(
                (F.col(c).cast("double") - mins[c].cast("double")) / span * slots
            ).cast("long"),
            F.lit(0).cast("long"),
        )
        # clamp FP round-up at the top edge
        scaled = F.least(F.greatest(scaled, F.lit(0).cast("long")), F.lit(slots).cast("long"))
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * ncols + j
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
) -> DataFrame:
    """Return ``df`` re-laid-out along the Z-curve of ``cols``: one
    aggregate pass computes per-column min/max, broadcast back as a 1-row
    crossJoin (no driver collect), every row gets its Morton key, and the
    result is range-repartitioned + sorted on it. Writing the result
    yields files whose parquet min/max stats are tight on every ``cols``
    member — the scan-pruning layout step of a 100 TB maintenance pass
    (the analogue of Delta/Iceberg OPTIMIZE ZORDER BY, expressed as plain
    DataFrame ops).
    """
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    mins = {c: F.col(f"__min_{c}") for c in cols}
    maxs = {c: F.col(f"__max_{c}") for c in cols}
    keyed = with_bounds.withColumn("__z__", zorder_key(cols, mins, maxs, bits)).drop(
        *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols]
    )
    n = num_files or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return (
        keyed.repartitionByRange(int(n), F.col("__z__"))
        .sortWithinPartitions("__z__")
        .drop("__z__")
    )


def expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Data-quality expectations: each rule is a BOOLEAN column expression
    that must hold per row; the result is one row per rule with its
    violation count and pass flag — the contract gate of a pipeline stage
    (Delta Live Tables / Great Expectations shape, engine-native).

    One aggregate pass evaluates every rule simultaneously (map-side
    combinable conditional sums — cost is one scan regardless of rule
    count); a NULL rule result counts as a violation (unknown is not
    compliant). Uniqueness-style rules need a distinct count and cannot
    ride a per-row expression; express them via ``unique_rule``.

    Rule names are arbitrary user strings: the unpivot is built with the
    DataFrame API (names only ever appear as ``lit`` values, never
    interpolated into SQL text), so a name with spaces, quotes, or
    anything else cannot break or inject into the query.
    """
    # positional aliases keep user-supplied names out of column-identifier
    # space entirely; the real names ride as literals in the unpivot below
    aliased = list(rules.items())
    aggs = [
        F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)).alias(f"__rule_{i}")
        for i, (_, cond) in enumerate(aliased)
    ]
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__rule_{i}").cast("long").alias("n_violations"),
            )
            for i, (name, _) in enumerate(aliased)
        ]
    )
    return (
        wide.select(F.explode(pairs).alias("kv"))
        .select("kv.rule", "kv.n_violations")
        .select("rule", "n_violations", (F.col("n_violations") == 0).alias("passed"))
    )


def unique_rule(df: DataFrame, cols: list[str], rule_name: str) -> DataFrame:
    """Uniqueness expectation in the same (rule, n_violations, passed)
    shape: violations = rows beyond the first per key (count - distinct).
    Two combinable aggregates, no window."""
    total = F.count(F.lit(1))
    distinct = F.count_distinct(*[F.col(c) for c in cols])
    return df.agg(
        F.lit(rule_name).alias("rule"),
        (total - distinct).cast("long").alias("n_violations"),
        ((total - distinct) == 0).alias("passed"),
    ).select("rule", "n_violations", "passed")


def compaction_plan(
    inventory: DataFrame,
    unit_col: str,
    size_col: str,
    target_size: int,
    num_ranges: int | None = None,
) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE bin-packing step of
    Delta/Iceberg): assign every inventory unit (a part file from a
    manifest, or a partition from a listing) to a merge group whose
    combined size approximates ``target_size``.

    Packing rule — cumulative-sum binning over the size-descending order:
    ``group = floor(cum_size_before / target)``. Deterministic, totally
    ordered, engine-agnostic (windows over exact integers — no greedy
    state machine, which neither SQL engine could replay identically).
    FFD-quality packing is NOT the goal; bounded groups with one pass is:
    every group's size is < target + max_unit_size.

    Scale shape — two-phase prefix sum (``operators/prefix.py``), never
    a single-task global window: a 100 TB inventory is millions of rows,
    and funneling them through one ``WindowExec: No Partition Defined``
    task is a planner stall. Bit-identical to the one-window form at any
    slicing (integer arithmetic; pinned by a randomized equivalence
    test).
    """
    from monster_etl_spark.operators.prefix import prefix_sum

    order = [F.col(size_col).desc(), F.col(unit_col).asc()]
    return prefix_sum(
        inventory.select(unit_col, size_col),
        order,
        F.col(size_col),
        "_cum_before",
        num_ranges,
    ).select(
        F.col(unit_col),
        F.col(size_col),
        F.floor(F.col("_cum_before") / F.lit(target_size)).cast("long").alias("merge_group"),
    )


def compaction_plan_sql(
    inventory_sql: str, unit_col: str, size_col: str, target_size: int
) -> str:
    """DuckDB twin of :func:`compaction_plan` (identical order + binning)."""
    return f"""
SELECT {unit_col}, {size_col},
       CAST(floor(coalesce(SUM({size_col}) OVER (
              ORDER BY {size_col} DESC, {unit_col} ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / {target_size}) AS BIGINT) AS merge_group
FROM ({inventory_sql}) AS inv
"""
