"""Every oracle-backed query in the registry must match its DuckDB twin at
sf0.001 (fast) — the local stand-in for the driver's sf0.01 gate.
Rows-only queries are smoke-run (must produce a stable schema and >= 0 rows).
"""

import pytest

from monster_etl_spark.queries import all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_oracle_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert df.columns
        return
    problems = compare(df, spec.oracle, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)
