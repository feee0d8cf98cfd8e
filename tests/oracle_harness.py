"""Local replica of the driver's DuckDB-oracle comparison: run a Spark
query and its oracle SQL on the same parquet tables, compare row count,
column names, and order-insensitive canonicalized values."""

from __future__ import annotations

import datetime as _dt
import decimal
import math

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def table_glob(sf_dir: str, t: str) -> str:
    """DuckDB-readable path for a table: the driver's testdata is one
    file per table; derived scale dirs (tools/gen_scale.py) are
    Spark-style part-file DIRECTORIES named table.parquet/."""
    import os

    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def run_oracle(sql: str, sf_dir: str):
    import os

    con = duckdb.connect()
    for t in TABLES:
        # derived scale dirs may carry a table SUBSET (e.g. the media
        # decade dirs ship documents only); register what exists — a
        # query over a missing table then fails with a clear binder
        # error instead of a view-creation crash for tables it never
        # touches
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{table_glob(sf_dir, t)}'")
    res = con.sql(sql)
    return res.columns, res.fetchall()


def canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 2**53:
            return f"i:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return canon_value(int(f)) if f == int(f) else f"f:{f!r}"
    if isinstance(v, _dt.datetime):
        return f"t:{v.isoformat()}"
    if isinstance(v, _dt.date):
        return f"t:{v.isoformat()}T00:00:00"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return f"x:{v.hex()}"
    return f"s:{v}"


def canon_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon_value(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty = parity."""
    problems = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    sc = canon_rows(s_cols, s_rows)
    oc = canon_rows(o_cols, o_rows)
    if sc != oc:
        # hoist the sets OUT of the comprehensions: `r not in set(oc)`
        # rebuilds the set per row — quadratic exactly when rows differ
        # (measured: a 1M-row mismatch ground a single core for 50+ min)
        so, ss = set(oc), set(sc)
        only_s = [r for r in sc if r not in so][:3]
        only_o = [r for r in oc if r not in ss][:3]
        problems.append(f"values differ; spark-only={only_s} oracle-only={only_o}")
    return problems
