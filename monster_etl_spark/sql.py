"""SQL gateway: register the warehouse tables as temp views so the engine
can be driven with plain ANSI SQL (``spark.sql``) — the query surface the
reference never had (SURVEY.md §3: "there is no query language")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


_REGISTERED: set[tuple[int, str]] = set()


def register_views(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Register every warehouse table as a temp view. Memoized per
    (session, sf_dir): repeat calls are free (each registration re-runs the
    table loaders, including the events timestamp reconstruction)."""
    from monster_etl_spark.queries import load

    key = (id(spark), sf_dir)
    if not force and key in _REGISTERED:
        return
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    _REGISTERED.add(key)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
