"""Per-query PLAN-BUILD cost: time ``fn(spark, sf_dir)`` alone (no action).

The bench's timed region is build + analysis + execution; at the test SFs
the Python-side construction of expression-dense plans is a measurable
slice of every timed run (round-11 found 35.9 s of build across the
headline set before ``dataFrameDebugging=false``). This tool ranks the
remaining builders so the expression-string refactors target the worst
offenders instead of guessing.

Usage: python tools/build_time.py [--sf-dir DIR] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monster_etl_spark import get_spark  # noqa: E402
from monster_etl_spark.queries import all_queries  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    registry = all_queries()
    import bench

    names = args.queries or [q for q in bench.BENCH_QUERIES if q in registry]
    spark = get_spark(app_name="build-time")
    # warm the reader/schema memo once so every query measures its own
    # expression construction, not the first parquet footer read
    for name in names:
        registry[name].fn(spark, args.sf_dir)
    out = {}
    for name in names:
        fn = registry[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
    total = round(sum(out.values()), 3)
    for k, v in sorted(out.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.3f}  {k}")
    print(json.dumps({"build_total_s": total, "n": len(out)}))


if __name__ == "__main__":
    main()
