"""Interleaved code-version A/B for a single registry query.

The round-7..9 drift investigations converged on one trustworthy method
for deciding whether a bench regression is code or environment: check
out the OLD source tree, probe the query min-of-N, restore/probe HEAD,
and INTERLEAVE the sessions on an idle box so day-scale drift hits both
sides equally (SCALE.md round-9 addenda). Round 9 ran it ad hoc twice;
this tool is that method, reusable.

Usage:
    python tools/ab_code_version.py --query dedup_minhash_lsh \
        --rev 5ee4892 [--runs 7] [--pairs 2] [--sf-dir /root/testdata/sf0.1]

It creates a git worktree of ``--rev`` under /tmp, then alternates
child processes OLD, HEAD, OLD, HEAD (``--pairs`` times each), each
child a fresh Spark session importing ONLY its own tree, warm-up +
``--runs`` timed runs, one JSON line per session. The parent prints a
final verdict line comparing min-of-all-sessions per tree.

Each child asserts the box is idle-ish first (no stray java/pytest
outside its own tree) so the A/B can't silently absorb tenancy noise —
the exact failure mode that motivated it.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(tree: str, query: str, sf_dir: str, runs: int) -> None:
    sys.path.insert(0, tree)
    from monster_etl_spark import get_spark
    from monster_etl_spark.queries import all_queries

    registry = all_queries()
    spark = get_spark(app_name=f"ab-{query}")
    # same warm-up shape as bench.py: JVM + codegen + parquet footers
    registry["t3_extract_fields"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    fn = registry[query].fn
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps({"tree": tree, "query": query, "best": min(times), "times": times}),
        flush=True,
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True)
    ap.add_argument("--rev", required=True, help="old source tree to A/B against HEAD")
    ap.add_argument("--runs", type=int, default=7)
    ap.add_argument("--pairs", type=int, default=2, help="OLD/HEAD session pairs")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--child", help="(internal) tree path to probe")
    args, rest = ap.parse_known_args()

    if args.child:
        child(args.child, args.query, args.sf_dir, args.runs)
        return

    wt = f"/tmp/ab_tree_{args.rev}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, args.rev],
            cwd=REPO, check=True, capture_output=True,
        )
    results: dict[str, list[float]] = {args.rev: [], "HEAD": []}
    try:
        for _ in range(args.pairs):
            for label, tree in ((args.rev, wt), ("HEAD", REPO)):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--query", args.query, "--rev", args.rev,
                     "--runs", str(args.runs),
                     "--sf-dir", args.sf_dir, "--child", tree],
                    capture_output=True, text=True, timeout=1800,
                )
                line = [l for l in r.stdout.splitlines() if l.startswith("{")]
                if not line:
                    print(json.dumps({"tree": label, "error": r.stderr[-500:]}),
                          flush=True)
                    continue
                rec = json.loads(line[-1])
                rec["tree"] = label
                results[label].append(rec["best"])
                print(json.dumps(rec), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=REPO, capture_output=True)
    old = min(results[args.rev]) if results[args.rev] else None
    new = min(results["HEAD"]) if results["HEAD"] else None
    verdict = None
    if old and new:
        # the r9 closure bar: HEAD at-or-under OLD => drift, not code
        verdict = "code-regression" if new > old * 1.15 else "drift-not-code"
    print(json.dumps({"query": args.query, "rev": args.rev, "old_best": old,
                      "head_best": new, "verdict": verdict}), flush=True)


if __name__ == "__main__":
    main()
