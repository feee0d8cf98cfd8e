"""Representation-level oracle parity: Spark toPandas dtypes must match
DuckDB .df() dtypes for every oracle-backed query — value equality is not
enough if the comparator looks at frames. Known tolerated delta: pandas
timestamp resolution (Spark converts to datetime64[ns], DuckDB to
datetime64[us]) — the same instant either way."""

import duckdb
import pytest

from monster_etl_spark.queries import all_queries
from tests.oracle_harness import TABLES

QUERIES = {n: s for n, s in all_queries().items() if s.oracle is not None}


def _norm(dtype: str) -> str:
    return "datetime64" if dtype.startswith("datetime64") else dtype


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_dtype_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    odf = con.sql(spec.oracle).df()
    s_dtypes = {c: _norm(str(sdf[c].dtype)) for c in sdf.columns}
    o_dtypes = {c: _norm(str(odf[c].dtype)) for c in odf.columns}
    assert s_dtypes == o_dtypes
