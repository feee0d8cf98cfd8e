"""Regenerate QUERIES.md from the live registry so doc counts can't drift.

Usage: python tools/gen_queries_md.py  (writes QUERIES.md at repo root)
"""

from __future__ import annotations

import sys
from collections import defaultdict

sys.path.insert(0, ".")

SECTIONS = {
    "refops_queries": "Reference-operator parity (SURVEY.md §2.2/§2.4/§2.9) + maintenance",
    "relational_queries": "Relational core (TPC-H shapes, windows, joins)",
    "relational2_queries": "Relational surface 2 (set ops, subqueries, scalar suites)",
    "tpch_queries": "More TPC-H shapes",
    "tpch_partsupp_queries": "TPC-H partsupp shapes (derived partsupp)",
    "events_queries": "Event-time analytics",
    "text_queries": "Text analysis",
    "dedup_queries": "Deduplication",
    "similarity_queries": "Similarity search (ANN)",
    "sampling_queries": "Deterministic sampling + quantile gates",
    "multimodal_queries": "Multimodal columns",
    "curation_queries": "Corpus curation",
    "streaming_queries": "Structured Streaming (driven to completion)",
}


def main() -> None:
    from monster_etl_spark.queries import all_queries  # noqa: PLC0415

    registry = all_queries()
    by_module: dict[str, list[tuple[str, object]]] = defaultdict(list)
    for name, spec in registry.items():
        mod = spec.fn.__module__.rsplit(".", 1)[-1]
        by_module[mod].append((name, spec))

    n_total = len(registry)
    n_oracle = sum(1 for s in registry.values() if s.oracle is not None)
    lines = [
        "# QUERIES — driver-contract inventory (auto-generated from the registry)",
        "",
        f"{n_total} queries; {n_oracle} oracle-backed.",
        "Source of truth: `monster_etl_spark/queries/` (this file mirrors `all_queries()`;",
        "regenerate with `python tools/gen_queries_md.py`).",
        "",
        "Verification depth: the full registry is driver-replica green at",
        "sf0.01 (the driver's gate; committed as `DRIVER_CHECK.json`), with",
        "every query DuckDB-hash-matched — zero rows-only entries. The",
        "approximate-kNN variants carry full-pipeline fixed-seed CTE oracles",
        "plus recall>=0.5 contract twins; t16's path column is oracle-checked",
        "via a partition-directory round-trip.",
    ]
    unknown = set(by_module) - set(SECTIONS)
    if unknown:
        raise SystemExit(f"query modules missing a SECTIONS entry: {sorted(unknown)}")
    for mod, title in SECTIONS.items():
        entries = sorted(by_module.get(mod, []))
        if not entries:
            continue
        lines += ["", f"## {title}", "", "| query | check | what |", "|---|---|---|"]
        for name, spec in entries:
            check = "DuckDB hash-match" if spec.oracle is not None else "rows-only"
            lines.append(f"| `{name}` | {check} | {spec.doc} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {n_total} queries; {n_oracle} oracle-backed")


if __name__ == "__main__":
    main()
