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
    map_in_pandas: int = 0
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


#: logical nodes that bound the cardinality of whatever sits beneath them —
#: a broadcast hint above one of these ships a BOUNDED intermediate (a 1-row
#: global aggregate, a LIMITed subset), not an SF-growing table.
#: ``LocalRelation`` is bounded by a different argument: it is data the
#: driver ALREADY holds (a driver-tier fit result / bounded collect, each
#: governed by its own cap contract audited at the collect site), so a
#: broadcast hint on it cannot ship more than the driver-resident rows —
#: the round-11 driver-tier k-means fit turned the centroid table from an
#: Aggregate subtree into a LocalRelation without changing its row bound.
_BOUNDING_NODES = (
    "Aggregate", "GlobalLimit", "LocalLimit", "Sample", "Deduplicate",
    "LocalRelation",
)


def broadcast_hinted_tables(df: DataFrame) -> list[str]:
    """First column name of every BASE RELATION pinned under an explicit
    ``broadcast()`` hint in the analyzed logical plan, excluding relations
    shielded by a cardinality-bounding node (global aggregate / limit).

    This is the durable no-scale-killer guard: AQE may legitimately pick a
    broadcast join for a genuinely small input at a given SF, but a HINT on
    an SF-growing table is pinned forever and OOMs the driver at 100 TB —
    the round-1 q3/q5/q18 defect class. Tests assert the returned set is a
    subset of the constant-size dims (``n_*``/``r_*``)."""
    out: list[str] = []

    def relations(node):
        name = node.nodeName()
        if any(b in name for b in _BOUNDING_NODES):
            return  # bounded subtree: broadcast is size-safe by construction
        if "Relation" in name:
            m = re.search(r"\[([^#,\]]+)#", node.simpleString(1000))
            out.append(m.group(1) if m else name)
            return
        for i in range(node.children().size()):
            relations(node.children().apply(i))

    def walk(node):
        if node.nodeName() == "ResolvedHint" and "broadcast" in node.simpleString(200).lower():
            relations(node)
            return
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().analyzed())
    return out


def plan_summary(df: DataFrame) -> PlanSummary:
    plan = formatted_plan(df)
    s = PlanSummary()
    s.shuffles = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    s.broadcasts = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
    s.sort_merge_joins = plan.count("SortMergeJoin")
    s.broadcast_hash_joins = plan.count("BroadcastHashJoin")
    s.python_evals = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
    s.map_in_pandas = len(re.findall(r"^\(\d+\) MapInPandas", plan, re.M))
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


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Node names of physical window operators whose partition spec is
    EMPTY — each one funnels its entire input through a single task
    (the ``WindowExec: No Partition Defined`` warning). The audit test
    asserts these appear only where the input is structurally bounded
    (a top-N, a strata-count rollup), never corpus-sized; corpus-sized
    prefix scans go through ``operators/prefix.py`` instead.

    Walks the pre-AQE physical plan via the JVM tree (the formatted
    plan OMITS the empty partition group, so text matching cannot see
    the difference)."""
    out: list[str] = []

    def walk(node):
        name = node.nodeName()
        try:
            if hasattr(node, "partitionSpec") and node.partitionSpec().isEmpty():
                out.append(name)
        except Exception:
            pass
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().sparkPlan())
    return out
