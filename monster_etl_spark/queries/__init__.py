"""Query registry backing ``__spark_entry__.py`` (the driver contract).

Each entry pairs a PySpark implementation (``(spark, sf_dir) -> DataFrame``)
with an ANSI-SQL oracle string DuckDB runs on the same parquet tables; the
driver hash-compares the two at sf=0.01. Oracle-less entries (genuinely not
SQL-expressible, e.g. streaming/stateful) get a rows-only check.

Column names are aliased identically on both sides — the driver's compare
sorts columns by name before hashing. Floating-point discipline:
aggregate sums go through DECIMAL (exact) and convert to DOUBLE once;
per-row float expressions are rounded (6dp) so cross-engine summation-order
differences cannot flip a hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


# Session-scoped SCHEMA memo: ``spark.read.parquet`` re-infers the
# schema from the footer (plus py4j chatter) on EVERY call even though
# the test tables are immutable — with ~88 headline queries x 1-3 loads
# x warm+timed runs that is seconds of pure re-analysis per bench pass.
# Passing the memoized schema back via ``.schema(...)`` skips the
# inference while still returning a FRESH relation per call (fresh
# expression ids — memoizing the DataFrame itself turns two loads of one
# table into an ambiguous self-join). The reader-side equivalent of a
# catalog/metastore table (guide §6); file LISTING is already cached by
# the session's shared FileStatusCache. No data or results are cached —
# every action still scans parquet (round-11).
_SCHEMA_MEMO: dict = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table == "events":
        return load_events(spark, sf_dir)
    path = f"{sf_dir}/{table}.parquet"
    key = (spark.sparkContext.applicationId, path)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-adaptive events reader. Some testdata generations store ``ts``
    as TIMESTAMP(NANOS), which Spark's parquet reader rejects outright
    (PARQUET_TYPE_ILLEGAL); others store plain TIMESTAMP(MICROS), which
    reads natively as timestamp_ntz. Handle both: read with the legacy
    nanos-as-long conf enabled, and only if ``ts`` actually arrives as a
    long rebuild a timestamp_ntz floored to microseconds — exactly what
    DuckDB's reader produces, so oracles agree either way.

    The reconstruction is timezone-independent: epoch arithmetic on an ntz
    literal, never via the session timezone. The day/fraction split keeps
    every intermediate inside exact double range (rem_us < 8.64e10).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    key = (spark.sparkContext.applicationId, path)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
    else:
        df = spark.read.schema(sch).parquet(path)
    if not isinstance(df.schema["ts"].dataType, T.LongType):
        return df
    # integer div/mod (never double) until the final sub-day fraction
    ts = F.expr(
        "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ) + make_dt_interval("
        "  CAST((ts div 1000) div 86400000000 AS INT), 0, 0,"
        "  CAST((ts div 1000) % 86400000000 AS DOUBLE) / 1e6)"
    )
    return df.withColumn("ts", ts)


def all_queries() -> dict[str, QuerySpec]:
    from monster_etl_spark.queries import (
        curation_queries,
        dedup_queries,
        events_queries,
        multimodal_queries,
        refops_queries,
        relational2_queries,
        relational_queries,
        sampling_queries,
        similarity_queries,
        streaming_queries,
        text_queries,
        tpch_partsupp_queries,
        tpch_queries,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (
        refops_queries,
        relational_queries,
        relational2_queries,
        tpch_queries,
        tpch_partsupp_queries,
        events_queries,
        text_queries,
        dedup_queries,
        similarity_queries,
        sampling_queries,
        multimodal_queries,
        curation_queries,
        streaming_queries,
    ):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
