"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()``  — every implemented operator/query from SURVEY.md §2 plus the
                 training-data-pipeline surface (dedup / similarity / text /
                 events), as (spark, sf_dir) -> DataFrame callables.
``oracle_sql()`` — DuckDB twins for the hash-compare gate. Every registry
                 query is oracle-backed (zero rows-only entries): t16's
                 path column round-trips through a partition directory, and
                 the approximate-kNN variants carry full-pipeline
                 fixed-seed CTE oracles.

Implementations live in ``monster_etl_spark.queries`` (registry) over the
operator library in ``monster_etl_spark.operators``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from monster_etl_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q3 shape (selective dim filter -> fact joins ->
    aggregate -> deterministic top-k) on /root/testdata/sf0.001."""
    from monster_etl_spark.queries.relational_queries import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
