"""Join strategies for skewed and co-located data at scale.

The reference has no joins at all (SURVEY.md §2.3); Spark provides the
algorithms, and this module adds the two patterns Catalyst does not apply
automatically:

- **salted join**: for a shuffle join where a handful of hot keys overwhelm
  their partitions, explode the small side into ``salt_factor`` copies and
  scatter the large side's hot rows across matching salt buckets. AQE's
  skew-join split handles *sort-merge* skew at runtime; salting is the
  explicit, planner-independent form (and works for aggregations too).
- **bucketed tables**: pre-shuffle both sides once at write time
  (``bucketBy`` on the join key); subsequent joins on that key are
  exchange-free. This is the 100 TB answer for repeatedly-joined fact
  tables — pay the shuffle once, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``large`` to ``small`` on column ``on`` with key salting.

    The large side gets a deterministic per-row salt in [0, salt_factor);
    the small side is exploded ``salt_factor``-fold with every salt value.
    Each (key, salt) shuffle bucket then carries ~1/salt_factor of a hot
    key's rows, bounding any single task. Result is row-identical to the
    plain join (verified against a plain-join oracle in the query registry).

    The per-row salt must be deterministic (not rand()) so retried tasks
    produce identical output — here it derives from the large side's own
    row content via pmod(xxhash64) (pmod, not abs-mod: abs(Long.MIN_VALUE)
    is still negative and would put a row in no salt bucket).

    Only inner and left joins are supported: for right/full joins an
    unmatched small-side row would surface once per salt copy.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salt_factor)).alias("__salt__")
    salted_large = large.withColumn("__salt__", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1))).alias("__salt__")
    salted_small = small.select("*", salts)
    out = salted_large.join(salted_small, [on, "__salt__"], how)
    return out.drop("__salt__")


def write_bucketed(df: DataFrame, name: str, key: str, num_buckets: int = 16) -> None:
    """Persist a table bucketed (and sorted) by the join key. Joins between
    two tables bucketed on the same key with the same bucket count run
    without any exchange — the shuffle was paid at write time."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(name)
    )


def asof_join_merge(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    count_col: str | None = None,
) -> DataFrame:
    """As-of join as a range-partitioned MERGE instead of an inequality
    join: for every left row, the latest right row of the same key at or
    before the left timestamp.

    The inequality-join form (``l.key = r.key AND r.ts <= l.ts`` then
    max/last per left row) expands to |matches| intermediate rows — per
    key, events x orders — before the aggregate collapses them; fine on a
    dimension-sized right side, quadratic pain when both sides are facts.
    This form never expands: tag both sides, union, and take one running
    ``last(value, ignoreNulls)`` over (key ORDER BY ts, side) — right
    rows sort BEFORE left rows at equal timestamps, so "at or before"
    includes ties. One shuffle of |L| + |R| rows on the key, O(1) state
    per row. This is the classic sort-merge as-of (kdb's aj, pandas
    merge_asof) distributed over Spark's window machinery.

    ``value_cols`` are carried from the right side (running last);
    ``count_col`` (optional) adds a running count of right rows at or
    before. Returns all left rows + those columns. Timestamps are
    compared on a common timestamp cast; the carried values keep their
    original types.

    Determinism: right rows tied on (key, ts) additionally sort by their
    value tuple, so the carried "last" is the GREATEST value tuple among
    ties — partition-layout-independent (a window ordered only by
    (ts, side) would carry whichever tied row happened to sort last).
    value_cols must therefore be orderable types.

    NULL timestamps: a right row whose timestamp casts to NULL can never
    satisfy ``r.ts <= l.ts`` and is dropped (under asc-nulls-first it
    would otherwise sort FIRST and be carried into every left row). A
    left row with a NULL timestamp matches nothing: it sorts before all
    surviving right rows, so its carried values are NULL and its count
    is 0 — the inequality-join semantics for an unknown "as of" point.
    """
    from pyspark.sql import Window

    lt = F.col(left_ts).cast("timestamp_ntz")
    rt = F.col(right_ts).cast("timestamp_ntz")
    l2 = left.select(
        F.col(left_key).alias("_k"), lt.alias("_t"), F.lit(1).alias("_side"), "*"
    )
    r2 = right.filter(rt.isNotNull()).select(
        F.col(right_key).alias("_k"), rt.alias("_t"), F.lit(0).alias("_side"), *value_cols
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy(
            F.col("_t").asc(),
            F.col("_side").asc(),
            *[F.col(v).asc_nulls_first() for v in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # all window expressions evaluate in ONE select against the UNTOUCHED
    # value tuple — a per-column withColumn loop would overwrite value
    # columns in place, so the shared window's tie-break orderBy for
    # later columns would re-resolve earlier value_cols against their
    # already-filled replacements
    filled = {v: F.last(v, ignorenulls=True).over(w) for v in value_cols}
    out_cols = [filled[c].alias(c) if c in filled else F.col(c) for c in u.columns]
    if count_col:
        out_cols.append(F.sum(F.lit(1) - F.col("_side")).over(w).cast("long").alias(count_col))
    u = u.select(*out_cols)
    return u.filter(F.col("_side") == 1).drop("_k", "_t", "_side")
