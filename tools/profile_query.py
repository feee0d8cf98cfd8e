"""Per-job wall-clock breakdown for one registry query.

The heavy headline queries at sf0.1 run nearly as fast at sf0.01 — their
cost is FIXED per-session work (iterative fits, checkpoints, collects),
not data volume. This tool shows where: it runs a query warm (guide
§1.4 noop sink), then dumps every Spark job the timed run launched —
job id, duration, description — from the public /api/v1 status
endpoint, so the per-action overhead (Lloyd rounds, lineage
checkpoints, vocabulary collects) is measured instead of guessed.

Usage: python tools/profile_query.py QUERY [--sf-dir DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monster_etl_spark import get_spark  # noqa: E402
from monster_etl_spark.queries import all_queries  # noqa: E402


def _jobs(spark):
    sc = spark.sparkContext
    url = sc.uiWebUrl
    with urllib.request.urlopen(
        f"{url}/api/v1/applications/{sc.applicationId}/jobs?status=succeeded", timeout=10
    ) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    registry = all_queries()
    fn = registry[args.query].fn
    spark = get_spark(
        app_name=f"profile-{args.query}", extra_conf={"spark.ui.enabled": "true"}
    )

    def once(tag: str, label: bool = True) -> float:
        # the timed run keeps default job names ("collect at ...",
        # "localCheckpoint at ...") so each job's call site is visible
        if label:
            spark.sparkContext.setJobDescription(f"{args.query} [{tag}]")
        t0 = time.monotonic()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    # warm-up runs (codegen, python workers, parquet footers)
    for i in range(args.runs):
        t = once(f"warm{i}")
        print(json.dumps({"run": f"warm{i}", "sec": round(t, 3)}), flush=True)

    before = {j["jobId"] for j in _jobs(spark)}
    t = once("timed", label=False)
    jobs = [j for j in _jobs(spark) if j["jobId"] not in before]
    jobs.sort(key=lambda j: j["jobId"])
    total_ms = 0
    for j in jobs:
        sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
        dur = None
        try:
            # sub-second precision from the GMT fields' fractional part
            fs = float("0" + j["submissionTime"][19:23].replace("GMT", "") or 0)
            fc = float("0" + j["completionTime"][19:23].replace("GMT", "") or 0)
            dur = (time.mktime(comp) + fc) - (time.mktime(sub) + fs)
        except Exception:
            dur = time.mktime(comp) - time.mktime(sub)
        total_ms += dur
        print(
            json.dumps(
                {
                    "job": j["jobId"],
                    "sec": round(dur, 3),
                    "stages": len(j.get("stageIds", [])),
                    "tasks": j.get("numTasks"),
                    "desc": (j.get("description") or j.get("name", ""))[:110],
                }
            ),
            flush=True,
        )
    print(
        json.dumps(
            {
                "run": "timed",
                "sec": round(t, 3),
                "jobs": len(jobs),
                "sum_job_sec": round(total_ms, 3),
                "gap_sec": round(t - total_ms, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
