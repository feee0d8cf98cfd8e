"""Driver-replica correctness gate.

Replicates the round driver's compare loop as closely as we can observe it
from CORRECTNESS_r01.json: run each registry query on Spark and its oracle
SQL on DuckDB at sf0.01, pull BOTH into pandas, canonicalize with
``df[sorted(cols)].sort_values(all cols)`` (the exact step that raised
``unhashable type: 'list'`` for array outputs in round 1), then compare row
count, column names, dtypes, and canonicalized values.

Usage:  python tools/driver_check.py [--sf-dir DIR] [query ...]
Prints one status line per query and a JSON summary; exit code 1 if any
oracle-backed query mismatches.
"""

from __future__ import annotations

import argparse
import datetime as _dt
import decimal
import json
import math
import os
import sys
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from monster_etl_spark.queries import all_queries  # noqa: E402
from tests.oracle_harness import TABLES  # noqa: E402


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """The driver's canonicalization shape: column-sort then row-sort on all
    columns. Raises TypeError on unhashable cell values (lists) just like
    the driver does — that is the point."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"  # pandas None->NaN for object cols; treat uniformly
    if isinstance(v, (bool,)):
        return f"b:{v}"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 2**53:
            return f"i:{int(v)}"
        return f"f:{round(v, 9)!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return f"i:{int(f)}" if f == int(f) else f"f:{round(f, 9)!r}"
    if isinstance(v, pd.Timestamp):
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.datetime):
        return f"t:{pd.Timestamp(v).isoformat()}"
    if isinstance(v, _dt.date):
        return f"t:{v.isoformat()}T00:00:00"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def _canon_rows(df: pd.DataFrame) -> list[str]:
    df = df.astype(object).where(pd.notnull(df), None)
    return ["|".join(_canon_value(v) for v in row) for row in df.itertuples(index=False)]


def check_query(spark, name, spec, sf_dir):
    res = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        sdf = spec.fn(spark, sf_dir).toPandas()
        res["spark_rows"] = len(sdf)
        if spec.oracle is None:
            res["err"] = "no_oracle"
            return res
        from tests.oracle_harness import table_glob

        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
        odf = con.sql(spec.oracle).df()
        res["oracle_rows"] = len(odf)
        sc, oc = _canon_frame(sdf), _canon_frame(odf)  # raises on lists
        res["rows_match"] = len(sc) == len(oc)
        res["schema_match"] = list(sc.columns) == list(oc.columns)
        if not res["schema_match"]:
            res["err"] = f"columns: spark={list(sc.columns)} oracle={list(oc.columns)}"
            return res
        srows, orows = _canon_rows(sc), _canon_rows(oc)
        res["hash_match"] = sorted(srows) == sorted(orows)
        if not res["hash_match"]:
            so = set(orows)
            ss = set(srows)
            only_s = [r for r in srows if r not in so][:2]
            only_o = [r for r in orows if r not in ss][:2]
            res["err"] = f"values: spark-only={only_s} oracle-only={only_o}"
    except Exception:
        res["err"] = traceback.format_exc(limit=3)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from monster_etl_spark.session import get_spark

    spark = get_spark()
    registry = all_queries()
    names = args.queries or sorted(registry)
    results, bad = {}, []
    for name in names:
        r = check_query(spark, name, registry[name], args.sf_dir)
        results[name] = r
        ok = r["hash_match"] or (r["err"] == "no_oracle" and r["spark_rows"] is not None)
        status = "PASS" if r["hash_match"] else ("rows-only" if r["err"] == "no_oracle" else "FAIL")
        if not ok:
            bad.append(name)
        err1 = (r["err"] or "").strip().splitlines()[-1] if r["err"] else ""
        print(f"{status:9s} {name}  rows={r['spark_rows']}  {err1 if status=='FAIL' else ''}", flush=True)
    # full-registry runs AT THE DRIVER'S SF own the committed verification
    # record; targeted or other-sf runs must never overwrite it with a
    # partial/foreign snapshot. realpath-normalize so a trailing slash,
    # relative path, or symlink never silently skips the write.
    is_driver_sf = os.path.realpath(args.sf_dir) == os.path.realpath("/root/testdata/sf0.01")
    if not args.queries and is_driver_sf:
        # stamp the exact code state the gate ran against (deterministic
        # — a regeneration at the same HEAD stays byte-identical, so
        # output-invariance checks still work)
        try:
            import subprocess

            head = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True
            ).stdout.strip()
        except Exception:
            head = None
        results["_meta"] = {"git_head": head, "n_queries": len(names)}
        with open("DRIVER_CHECK.json", "w") as f:
            json.dump(results, f, indent=1)
    elif not args.queries:
        print(f"note: sf_dir {args.sf_dir!r} is not the driver SF — DRIVER_CHECK.json not written")
    print(f"\n{len(names) - len(bad)}/{len(names)} ok; failures: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
