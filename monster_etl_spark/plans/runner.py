"""Generic declarative pipeline runner.

The reference's ethos — pipelines described by per-table configs, not code
(``V2FConstants.scala``) — generalized: a pipeline is a JSON-able dict

    {
      "source":  {"format": "tsv"|"jsonl"|"parquet", "path": ...,
                  "options": {...}},
      "steps":   [{"op": <operator>, ...kwargs}, ...],
      "sink":    {"format": "jsonl"|"parquet", "path": ...,
                  "drop_null_fields": bool, "partition_by": [...]}
    }

Each step's ``op`` names a registered operator; kwargs are passed through.
The v2f pipelines are expressible in this vocabulary; so is any cleanup
pipeline a reference user would write. The assembled job is still one lazy
DataFrame — Catalyst sees the whole chain, so declaring a pipeline costs
nothing at execution time.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from monster_etl_spark.naming import columns_to_snake_case
from monster_etl_spark.operators import transforms as tr
from monster_etl_spark.sources.jsonl import read_json_lines, write_json_lines
from monster_etl_spark.sources.tsv import read_tsv


def _scrub_pii_cols(df: DataFrame, fields: list[str]) -> DataFrame:
    from pyspark.sql import functions as F

    from monster_etl_spark.operators.text import scrub_pii

    return df.withColumns({c: scrub_pii(F.col(c)) for c in fields if c in df.columns})


def _text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    from monster_etl_spark.operators.text import add_text_features

    return add_text_features(df, text_col)

# operator registry: name -> fn(df, **kwargs)
OPS: dict[str, Callable[..., DataFrame]] = {
    "rename_fields": tr.rename_fields,
    "remove_fields": tr.remove_fields,
    "extract_fields": tr.extract_fields,
    "collect_fields": tr.collect_fields,
    "concat_fields": tr.concat_fields,
    "snake_case": lambda df: columns_to_snake_case(df),
    "parse_longs": tr.parse_longs,
    "parse_doubles": tr.parse_doubles,
    "parse_booleans": tr.parse_booleans,
    "parse_string_arrays": tr.parse_string_arrays,
    "parse_long_arrays": tr.parse_long_arrays,
    "parse_double_arrays": tr.parse_double_arrays,
    "ensure_arrays": tr.ensure_arrays,
    "add_column_from_path": tr.add_column_from_path,
    "distinct_by": lambda df, keys: tr.distinct_by(df, keys),
    "filter": lambda df, condition: df.filter(condition),
    "select": lambda df, columns: df.select(*columns),
    "scrub_pii": _scrub_pii_cols,
    "text_features": _text_features,
}


def _join_step(spark: SparkSession, df: DataFrame, step: dict[str, Any]) -> DataFrame:
    """{"op": "join", "source": {...}, "on": [...], "how": "left",
    "broadcast": true} — joins another declared source."""
    from pyspark.sql import functions as F

    other = read_source(spark, step["source"])
    if step.get("select"):
        other = other.select(*step["select"])
    if step.get("broadcast"):
        other = F.broadcast(other)
    return df.join(other, step["on"], step.get("how", "inner"))


def _aggregate_step(df: DataFrame, step: dict[str, Any]) -> DataFrame:
    """{"op": "aggregate", "group_by": [...], "aggs": {"alias": "sum(x)"}}
    — SQL expressions keep the step JSON-declarable."""
    from pyspark.sql import functions as F

    aggs = [F.expr(expr).alias(alias) for alias, expr in step["aggs"].items()]
    gb = step.get("group_by", [])
    return df.groupBy(*gb).agg(*aggs) if gb else df.agg(*aggs)


def read_source(spark: SparkSession, source: dict[str, Any]) -> DataFrame:
    fmt = source["format"]
    opts = source.get("options", {})
    if fmt == "tsv":
        return read_tsv(spark, source["path"], **opts)
    if fmt == "jsonl":
        return read_json_lines(spark, source["path"], **opts)
    if fmt == "parquet":
        return spark.read.options(**opts).parquet(source["path"])
    raise ValueError(f"unknown source format {fmt!r}")


def apply_steps(
    df: DataFrame, steps: list[dict[str, Any]], spark: SparkSession | None = None
) -> DataFrame:
    for step in steps:
        step = dict(step)
        op = step.pop("op")
        if op == "join":
            if spark is None:
                raise ValueError("join step requires the session context (use run_pipeline)")
            df = _join_step(spark, df, step)
        elif op == "aggregate":
            df = _aggregate_step(df, step)
        elif op in OPS:
            df = OPS[op](df, **step)
        else:
            raise ValueError(f"unknown op {op!r}; known: {sorted(OPS) + ['join', 'aggregate']}")
    return df


def write_sink(df: DataFrame, sink: dict[str, Any]) -> None:
    fmt = sink["format"]
    if fmt == "jsonl":
        if sink.get("partition_by"):
            (
                df.write.mode(sink.get("mode", "overwrite"))
                .option("ignoreNullFields", "true" if sink.get("drop_null_fields") else "false")
                .partitionBy(*sink["partition_by"])
                .json(sink["path"])
            )
            return
        write_json_lines(
            df,
            sink["path"],
            drop_null_fields=sink.get("drop_null_fields", False),
            mode=sink.get("mode", "overwrite"),
        )
        return
    if fmt == "parquet":
        writer = df.write.mode(sink.get("mode", "overwrite"))
        if sink.get("partition_by"):
            writer = writer.partitionBy(*sink["partition_by"])
        writer.parquet(sink["path"])
        return
    raise ValueError(f"unknown sink format {fmt!r}")


def run_pipeline(spark: SparkSession, pipeline: dict[str, Any]) -> DataFrame:
    """Assemble and run; returns the final DataFrame (also written if a
    sink is declared)."""
    df = apply_steps(read_source(spark, pipeline["source"]), pipeline.get("steps", []), spark)
    if "sink" in pipeline:
        write_sink(df, pipeline["sink"])
    return df
