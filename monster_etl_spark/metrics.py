"""Per-query shuffle/spill accounting from the Spark status REST API.

The round-4 scale soak left one alpha (sf100 q5 at 1.19) attributed to
"disk-bound single box" by inference, not measurement. This module turns
that class of call into data: snapshot the cumulative completed-stage
metrics before and after a query, and the delta is the query's shuffle
bytes written/read and memory/disk spill.

Uses the public ``/api/v1`` status endpoint (the same JSON the History
Server serves), so it works identically on local mode and a real cluster
driver — no py4j internals. Requires ``spark.ui.enabled=true`` on the
session; when the UI is off (the engine's default — tests don't want the
port), ``snapshot`` returns ``None`` and callers skip the accounting.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import SparkSession

# REST field -> short report key
_FIELDS = {
    "shuffleWriteBytes": "shuffle_write",
    "shuffleReadBytes": "shuffle_read",
    "memoryBytesSpilled": "mem_spill",
    "diskBytesSpilled": "disk_spill",
}


def snapshot(spark: SparkSession) -> dict[str, dict[str, int]] | None:
    """Per-stage-attempt metrics for this application keyed by
    ``"<stageId>.<attemptId>"``, or ``None`` when the UI/REST server is
    not running. Keyed (not summed) on purpose: the UI retains a bounded
    stage list (``spark.ui.retainedStages``), so a cumulative sum can
    DECREASE when old stages are evicted — deltas must be computed from
    the stages that are NEW between two snapshots, never from totals."""
    sc = spark.sparkContext
    url = sc.uiWebUrl
    if not url:
        return None
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{sc.applicationId}/stages", timeout=10
        ) as r:
            stages = json.load(r)
    except Exception:
        return None
    out: dict[str, dict[str, int]] = {}
    for s in stages:
        key = f"{s.get('stageId')}.{s.get('attemptId')}"
        out[key] = {
            out_key: int(s.get(rest_key, 0) or 0) for rest_key, out_key in _FIELDS.items()
        }
    return out


def delta(
    before: dict[str, dict[str, int]] | None, after: dict[str, dict[str, int]] | None
) -> dict[str, int] | None:
    """Metrics attributable to the work between two snapshots: the sum
    over stage attempts present in ``after`` but not ``before`` (queries
    run sequentially, so those are exactly the measured query's stages;
    immune to retained-stage eviction shrinking the totals)."""
    if before is None or after is None:
        return None
    out = dict.fromkeys(_FIELDS.values(), 0)
    for key, m in after.items():
        if key in before:
            continue
        for k, v in m.items():
            out[k] += v
    return out


def fmt_bytes(n: int) -> str:
    """Human-readable bytes for soak log lines (binary units)."""
    size = float(n)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(size) < 1024 or unit == "TiB":
            return f"{size:.1f}{unit}" if unit != "B" else f"{int(size)}B"
        size /= 1024
    return f"{size:.1f}TiB"
