"""Deterministic scale-up generator: replicate the driver's testdata to a
larger scale factor INSIDE the repo (testdata itself is read-only), so the
expensive query families can be soaked at ~10x and bench.py can report
measured scaling exponents instead of design assertions.

    python tools/gen_scale.py --factor 10 \
        --src /root/testdata/sf0.1 --out .scaledata/sf1

Scaling model (TPC-H-faithful where it matters):

- FACT tables (orders, lineitem, events) and SF-growing dims (customer,
  supplier, part) are replicated ``factor`` times with per-copy key
  offsets; every foreign key is offset by ITS OWN table's stride, so
  join multiplicities per key are IDENTICAL to the source — q3/q5/q18
  grow linearly on both sides with no synthetic skew.
- region/nation stay fixed (constant-size dims, as in TPC-H).
- documents: every token in copy k>0 gets a ``_c{k}`` suffix. An
  injective token rename preserves each copy's internal dup/shingle
  structure exactly while making cross-copy shingle sets disjoint —
  near-dup density stays constant as the corpus grows (replicating text
  verbatim would make EVERY doc a 10-way dup and blow pair counts
  quadratically, which is not how a real corpus scales).
- embeddings: copy k's vectors are circularly rotated by k positions
  (norm-preserving, direction-decorrelating for random vectors), so ANN
  structure scales without planting exact duplicates.

Everything is a pure function of (source rows, copy index): re-running
reproduces byte-identical values (file layout may differ).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stride(df: DataFrame, key: str) -> int:
    """Power-of-ten stride above the key's max: offsets stay readable and
    copies can never collide."""
    mx = df.agg(F.max(key)).collect()[0][0] or 0
    s = 1
    while s <= mx:
        s *= 10
    return s


def _replicate(df: DataFrame, factor: int, offsets: dict[str, int],
               mutate=None) -> DataFrame:
    """Union ``factor`` copies; copy k adds ``k * stride`` to each keyed
    column and applies ``mutate(df, k)`` for content columns."""
    parts = []
    for k in range(factor):
        part = df
        for col, stride in offsets.items():
            part = part.withColumn(col, (F.col(col) + F.lit(k * stride)).cast("long"))
        if mutate is not None:
            part = mutate(part, k)
        parts.append(part)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _mutate_text(df: DataFrame, k: int) -> DataFrame:
    if k == 0:
        return df
    tag = F.lit(f"_c{k}")
    return df.withColumn(
        "text",
        F.array_join(
            F.transform(F.split(F.col("text"), " "), lambda t: F.concat(t, tag)), " "
        ),
    )


def _mutate_embedding(df: DataFrame, k: int) -> DataFrame:
    if k == 0:
        return df
    n = F.size("embedding")
    rot = F.lit(k)
    # circular rotation by k: slice(k+1..n) ++ slice(1..k)
    return df.withColumn(
        "embedding",
        F.concat(
            F.slice(F.col("embedding"), rot + 1, n - rot),
            F.slice(F.col("embedding"), 1, rot),
        ),
    )


def generate(
    spark: SparkSession, src: str, out: str, factor: int,
    tables: list[str] | None = None,
) -> None:
    """``tables``: optional subset to materialize (e.g. ["embeddings"]
    for the ANN decade, ["documents"] for the media decade — the
    sf100m precedent). Stride computation still reads every table the
    SUBSET's offsets depend on; unrequested tables are simply not
    written, so a 10x-of-sf10 embeddings-only run costs ~0.5 GB, not
    17 GB."""
    os.makedirs(out, exist_ok=True)
    rd = lambda t: spark.read.parquet(f"{src}/{t}.parquet")

    # strides are lazy + memoized so a table-subset run reads only the
    # tables its offsets depend on (src may itself be a subset dir)
    _stride_spec = {
        "customer": ("customer", "c_custkey"),
        "supplier": ("supplier", "s_suppkey"),
        "part": ("part", "p_partkey"),
        "orders": ("orders", "o_orderkey"),
        "events_id": ("events", "event_id"),
        "events_user": ("events", "user_id"),
        "documents": ("documents", "doc_id"),
        "embeddings": ("embeddings", "vec_id"),
    }
    _stride_cache: dict[str, int] = {}

    def st(key: str) -> int:
        if key not in _stride_cache:
            t, col = _stride_spec[key]
            _stride_cache[key] = _stride(rd(t), col)
        return _stride_cache[key]

    builders = {
        "region": lambda: (rd("region"), 1),
        "nation": lambda: (rd("nation"), 1),
        "customer": lambda: (
            _replicate(rd("customer"), factor, {"c_custkey": st("customer")}), 8),
        "supplier": lambda: (
            _replicate(rd("supplier"), factor, {"s_suppkey": st("supplier")}), 4),
        "part": lambda: (
            _replicate(rd("part"), factor, {"p_partkey": st("part")}), 8),
        "orders": lambda: (
            _replicate(rd("orders"), factor,
                       {"o_orderkey": st("orders"), "o_custkey": st("customer")}), 16),
        "lineitem": lambda: (
            _replicate(rd("lineitem"), factor,
                       {"l_orderkey": st("orders"), "l_partkey": st("part"),
                        "l_suppkey": st("supplier")}), 32),
        "events": lambda: (
            _replicate(rd("events"), factor,
                       {"event_id": st("events_id"), "user_id": st("events_user")}), 16),
        "documents": lambda: (
            _replicate(rd("documents"), factor, {"doc_id": st("documents")},
                       mutate=_mutate_text), 16),
        "embeddings": lambda: (
            _replicate(rd("embeddings"), factor, {"vec_id": st("embeddings")},
                       mutate=_mutate_embedding), 8),
    }
    wanted = tables or list(builders)
    unknown = set(wanted) - set(builders)
    if unknown:
        raise SystemExit(f"unknown tables: {sorted(unknown)}")
    plans = {t: builders[t]() for t in wanted}

    for table, (df, n_files) in plans.items():
        dst = f"{out}/{table}.parquet"
        df.repartition(n_files).write.mode("overwrite").parquet(dst)
        print(f"  {table}: {spark.read.parquet(dst).count()} rows -> {dst}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset (default: all tables)")
    args = ap.parse_args()

    from monster_etl_spark import get_spark

    spark = get_spark(app_name="gen-scale")
    generate(spark, args.src.rstrip("/"), args.out.rstrip("/"), args.factor,
             tables=args.tables.split(",") if args.tables else None)


if __name__ == "__main__":
    main()
