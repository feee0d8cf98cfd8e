"""Rounding-divergence sweep (round-9 verdict #6).

The sf100 media soak proved Spark and DuckDB ``round()`` can disagree
on the same double (flac ``duration_sec``: 1001/16000; gif
``mean_intensity``: sum/40960). Investigating for this tool pinned the
ACTUAL mechanism — it is not HALF_UP-vs-HALF_EVEN as first recorded:

- DuckDB rounds the BINARY value of the double (and is ties-away on
  exact binary ties: round(2.5::DOUBLE, 0) = 3);
- Spark/Java rounds the double's SHORTEST DECIMAL REPR
  (``BigDecimal.valueOf``), HALF_UP.

They diverge exactly when a value's shortest repr at precision n+1
ends in a half (``...5``) whose binary value sits BELOW the decimal
half: Spark sees "0.0625625" and rounds up; DuckDB sees
0.06256249999... and rounds down. This sweep detects that class
mechanically for every oracle-backed registry query: each oracle is
evaluated as written (DuckDB semantics — the driver gate's oracle
side) and again with every ``round(`` rewritten to ``__spark_round(``,
a DuckDB emulation of the Spark side
(``CAST(round(CAST(CAST(CAST(x AS DOUBLE) AS VARCHAR) AS
DECIMAL(38,15)), n) AS DOUBLE)`` — validated to reproduce the r9 flac
divergence bit-for-bit, including the sign and the
exact-binary-tie agreement cases). Any row diff = a query output whose
driver-gate hash depends on the engines' round mechanism at this scale
factor. A clean sweep = "zero registry outputs whose value depends on
round mode at driver sfs", checked instead of lucky — so a
driver-corpus change that pushes a gate query onto a divergent value
is caught by the builder first.

    python tools/tie_sweep.py [--sf-dirs a,b,c] [--threads N] [query ...]

Prints one line per (sf, query) only when divergent; a JSON summary
always.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ROUND = re.compile(r"\bround\s*\(", re.IGNORECASE)

SPARK_ROUND_MACROS = (
    "CREATE MACRO __spark_round(x, n) AS "
    "CAST(round(CAST(CAST(CAST(x AS DOUBLE) AS VARCHAR) AS DECIMAL(38,15)), n)"
    " AS DOUBLE)",
    "CREATE MACRO __spark_round1(x) AS "
    "CAST(round(CAST(CAST(CAST(x AS DOUBLE) AS VARCHAR) AS DECIMAL(38,15)), 0)"
    " AS DOUBLE)",
)


def spark_round_sql(sql: str) -> str:
    """Rewrite every round( call to the Spark-round emulation, arity-
    aware (duckdb 1.0 has no macro overloads): the matching close-paren
    is found by depth scan and top-level commas are counted — quotes
    respected so a comma inside a string literal can't split an arg."""
    out = []
    i = 0
    while True:
        m = _ROUND.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i : m.start()])
        depth, j, commas, quote = 1, m.end(), 0, None
        while j < len(sql) and depth:
            ch = sql[j]
            if quote:
                if ch == quote:
                    quote = None
            elif ch in "'\"":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                commas += 1
            j += 1
        out.append("__spark_round(" if commas else "__spark_round1(")
        i = m.end()


def sweep_one(con, sql: str) -> list[str]:
    """Columns whose values differ between DuckDB round and the
    Spark-round emulation (row-order insensitive; values canonicalized
    through the oracle harness's canon_value so DECIMAL-vs-DOUBLE type
    differences can't false-positive)."""
    from tests.oracle_harness import canon_value

    cols = con.sql(f"SELECT * FROM ({sql}) __t LIMIT 0").columns
    base = con.sql(f"SELECT * FROM ({sql}) __t").fetchall()
    up = con.sql(f"SELECT * FROM ({spark_round_sql(sql)}) __t").fetchall()
    if len(base) != len(up):
        return ["__row_count__"]
    key = lambda r: tuple(canon_value(x) for x in r)
    base, up = sorted(base, key=key), sorted(up, key=key)
    diff_cols: set[str] = set()
    for rb, ru in zip(base, up):
        for c, vb, vu in zip(cols, rb, ru):
            if canon_value(vb) != canon_value(vu):
                diff_cols.add(c)
    return sorted(diff_cols)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs",
        default="/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
    )
    ap.add_argument("--threads", type=int, default=0,
                    help="cap DuckDB threads (0 = library default)")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import duckdb

    from monster_etl_spark.queries import all_queries
    from tests.oracle_harness import TABLES, table_glob

    reg = all_queries()
    names = args.queries or [n for n, s in sorted(reg.items()) if s.oracle]
    summary: dict[str, dict[str, list[str]]] = {}
    for sf_dir in args.sf_dirs.split(","):
        sf_dir = sf_dir.rstrip("/")
        con = duckdb.connect()
        if args.threads:
            con.sql(f"SET threads={args.threads}")
        for m in SPARK_ROUND_MACROS:
            con.sql(m)
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.sql(
                    f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'"
                )
        hits: dict[str, list[str]] = {}
        for name in names:
            spec = reg[name]
            if not spec.oracle:
                continue
            try:
                cols = sweep_one(con, spec.oracle)
            except Exception as exc:  # report, never mask
                cols = [f"__error__: {str(exc)[:120]}"]
            if cols:
                hits[name] = cols
                print(json.dumps({"sf_dir": sf_dir, "query": name,
                                  "divergent_columns": cols}), flush=True)
        summary[sf_dir] = hits
        con.close()
    print(json.dumps({
        "queries_swept": len(names),
        "hits": summary,
        "clean": all(not h for h in summary.values()),
    }), flush=True)


if __name__ == "__main__":
    main()
