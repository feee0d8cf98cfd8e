"""Structured physical-plan inspection.

``plan_summary(df)`` parses ``explain('formatted')`` into the handful of
facts that decide whether a plan scales — shuffle count, broadcast count,
scan pushdowns, Python crossings, codegen spans — so perf reviews and the
plan-shape tests read plan *facts* instead of grepping plan text ad hoc.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class ScanInfo:
    fmt: str
    pushed_filters: str
    read_schema: str


@dataclass
class PlanSummary:
    shuffles: int = 0
    broadcasts: int = 0
    sort_merge_joins: int = 0
    broadcast_hash_joins: int = 0
    python_evals: int = 0
    codegen_spans: int = 0
    scans: list[ScanInfo] = field(default_factory=list)

    @property
    def is_narrow(self) -> bool:
        return self.shuffles == 0 and self.broadcasts == 0


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_summary(df: DataFrame) -> PlanSummary:
    plan = formatted_plan(df)
    s = PlanSummary()
    s.shuffles = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    s.broadcasts = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
    s.sort_merge_joins = plan.count("SortMergeJoin")
    s.broadcast_hash_joins = plan.count("BroadcastHashJoin")
    s.python_evals = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
    s.codegen_spans = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))

    for m in re.finditer(r"^\(\d+\) Scan (\w+)([\s\S]*?)(?=^\(\d+\)|\Z)", plan, re.M):
        body = m.group(2)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", body)
        schema = re.search(r"ReadSchema: (.*)", body)
        s.scans.append(
            ScanInfo(
                fmt=m.group(1),
                pushed_filters=pushed.group(1) if pushed else "",
                read_schema=schema.group(1).strip() if schema else "",
            )
        )
    return s
