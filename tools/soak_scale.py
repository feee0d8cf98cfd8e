"""Manual scale soak: time the bench soak set at an arbitrary scale dir.

Reproduces SCALE.md's second-decade table:

    python tools/gen_scale.py --factor 10 --src .scaledata/sf1 --out .scaledata/sf10
    python tools/soak_scale.py --sf-dir .scaledata/sf10 [--best-of 2] [query ...]

Prints one line per query and a JSON summary. Single-run mode (default
best-of 1) is what the sf10 table used — fine for reading asymptotes,
but sequential single runs inherit GC pressure from heavy predecessors
(SCALE.md's ngram-jaccard footnote); pass --best-of 2 for steady-state
numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".scaledata/sf10")
    ap.add_argument("--best-of", type=int, default=1)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench
    from monster_etl_spark import metrics
    from monster_etl_spark.queries import all_queries
    from monster_etl_spark.session import get_spark

    # UI on: the /api/v1 status endpoint is where per-query shuffle/spill
    # deltas come from (metrics.py) — "disk-bound" claims become data
    spark = get_spark(extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    names = args.queries or bench.SOAK_QUERIES
    # warm the session so the first query doesn't pay JVM/codegen init
    reg["t3_extract_fields"].fn(spark, args.sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    qmetrics: dict[str, dict[str, int]] = {}
    for name in names:
        best = float("inf")
        for _ in range(max(1, args.best_of)):
            before = metrics.snapshot(spark)
            t0 = time.perf_counter()
            reg[name].fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            if elapsed < best:
                best = elapsed
                d = metrics.delta(before, metrics.snapshot(spark))
                if d is not None:
                    qmetrics[name] = d
        out[name] = round(best, 2)
        m = qmetrics.get(name)
        mtxt = (
            "  sw={} sr={} spill(mem={} disk={})".format(
                metrics.fmt_bytes(m["shuffle_write"]),
                metrics.fmt_bytes(m["shuffle_read"]),
                metrics.fmt_bytes(m["mem_spill"]),
                metrics.fmt_bytes(m["disk_spill"]),
            )
            if m
            else ""
        )
        print(f"{name} {out[name]}{mtxt}", flush=True)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "best_of": args.best_of,
                "queries": out,
                "stage_metrics": qmetrics,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
