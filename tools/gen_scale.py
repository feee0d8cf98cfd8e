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


def generate(spark: SparkSession, src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    rd = lambda t: spark.read.parquet(f"{src}/{t}.parquet")

    strides = {
        "customer": _stride(rd("customer"), "c_custkey"),
        "supplier": _stride(rd("supplier"), "s_suppkey"),
        "part": _stride(rd("part"), "p_partkey"),
        "orders": _stride(rd("orders"), "o_orderkey"),
        "events_id": _stride(rd("events"), "event_id"),
        "events_user": _stride(rd("events"), "user_id"),
        "documents": _stride(rd("documents"), "doc_id"),
        "embeddings": _stride(rd("embeddings"), "vec_id"),
    }

    plans: dict[str, tuple[DataFrame, int]] = {}  # table -> (df, n_files)
    plans["region"] = (rd("region"), 1)
    plans["nation"] = (rd("nation"), 1)
    plans["customer"] = (
        _replicate(rd("customer"), factor, {"c_custkey": strides["customer"]}), 8)
    plans["supplier"] = (
        _replicate(rd("supplier"), factor, {"s_suppkey": strides["supplier"]}), 4)
    plans["part"] = (
        _replicate(rd("part"), factor, {"p_partkey": strides["part"]}), 8)
    plans["orders"] = (
        _replicate(rd("orders"), factor,
                   {"o_orderkey": strides["orders"], "o_custkey": strides["customer"]}), 16)
    plans["lineitem"] = (
        _replicate(rd("lineitem"), factor,
                   {"l_orderkey": strides["orders"], "l_partkey": strides["part"],
                    "l_suppkey": strides["supplier"]}), 32)
    plans["events"] = (
        _replicate(rd("events"), factor,
                   {"event_id": strides["events_id"], "user_id": strides["events_user"]}), 16)
    plans["documents"] = (
        _replicate(rd("documents"), factor, {"doc_id": strides["documents"]},
                   mutate=_mutate_text), 16)
    plans["embeddings"] = (
        _replicate(rd("embeddings"), factor, {"vec_id": strides["embeddings"]},
                   mutate=_mutate_embedding), 8)

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
    args = ap.parse_args()

    from monster_etl_spark import get_spark

    spark = get_spark(app_name="gen-scale")
    generate(spark, args.src.rstrip("/"), args.out.rstrip("/"), args.factor)


if __name__ == "__main__":
    main()
