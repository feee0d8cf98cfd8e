"""JSON-lines source/sink (reference S1/S2/S5/S6).

Reference behavior:

- ``readJsonLists`` (``MsgIO.scala:83-98``): one JSON object per line,
  malformed line -> job failure. Mapped to ``spark.read.json`` with
  ``mode=FAILFAST``.
- Numeric rule (``MsgIO.scala:22-32``): integral JSON numbers are longs,
  only true decimals are doubles — Spark's JSON schema inference has
  exactly this split (``bigint`` vs ``double``), so ``15225.0`` infers
  double; when a column must be long despite ``.0`` raw text the caller
  passes it in ``long_columns`` (SURVEY.md §1.2).
- ``writeJsonLists`` (``MsgIO.scala:106-115``): compact JSON-lines
  part-files, ``.json`` suffix, explicit nulls PRESERVED
  (``ignoreNullFields=false``). The TSV-derived tables instead omit absent
  keys -> ``drop_null_fields=True`` (SURVEY.md §1.5, §7.3.2).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from monster_etl_spark.operators.transforms import parse_longs


def read_json_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    long_columns: Iterable[str] = (),
) -> DataFrame:
    """S1 ``readJsonLists``: JSON-lines glob -> DataFrame, fail-fast.

    ``long_columns``: columns whose raw text may carry a trailing ``.0``
    but are integral by contract (reference reads ``15225.0`` as long
    15225, ``MsgIO.scala:32``). Parsed via the T9 ``.0``-strip.
    """
    reader = spark.read.option("mode", "FAILFAST")
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    longs = [c for c in long_columns if c in df.columns]
    if longs:
        dtypes = dict(df.dtypes)
        numeric, stringy = [], []
        for c in longs:
            (numeric if dtypes[c] in ("double", "float", "bigint", "int") else stringy).append(c)
        if numeric:
            # numeric source: cast directly — a string round-trip would hit
            # Java's scientific notation for |x| >= 1e7 ('1.5225E7') and
            # break the .0-strip parse; the contract column is integral
            df = df.withColumns({c: df[c].cast("long") for c in numeric})
        if stringy:
            # raw text source: the reference .0-strip parse (T9)
            df = parse_longs(df, stringy)
    return df


def read_json_lines_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Production-ETL alternative to fail-fast: PERMISSIVE read that routes
    malformed lines to a quarantine frame instead of failing the job.

    Returns (good, bad): ``good`` has the target schema; ``bad`` carries the
    raw offending line in ``corrupt_record``. At scale this is the pattern
    that keeps a 100 TB ingest from dying on one bad shard — quarantine is
    written alongside the output and triaged separately.
    """
    schema_with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    df = (
        spark.read.schema(schema_with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()  # required: corrupt-record column is only stable on a materialized frame
    )
    good = df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    bad = df.filter(df["_corrupt_record"].isNotNull()).select(
        df["_corrupt_record"].alias("corrupt_record")
    )
    return good, bad


def nan_sentinel_array(col: Column) -> Column:
    """Output-side rewrite closing the SURVEY §7.3.1 representation gap:
    the reference renders nan-sentinels inside numeric arrays as the
    literal string ``"nan"`` (``MsgTransformations.scala:236-248``),
    producing heterogeneous JSON arrays like ``[1.0,"nan"]`` that a
    relational ``array<double>`` cannot hold. This renders the column as a
    raw JSON fragment (NULL element -> ``"nan"``) parsed into a VARIANT,
    which the JSON writer emits verbatim — byte-parity with the
    reference's golden files. Narrow per-row expression; NULL arrays stay
    NULL."""
    frag = F.concat(
        F.lit("["),
        F.array_join(
            F.transform(col, lambda x: F.coalesce(x.cast("string"), F.lit('"nan"'))), ","
        ),
        F.lit("]"),
    )
    return F.when(col.isNull(), F.lit(None)).otherwise(F.parse_json(frag))


def write_json_lines(
    df: DataFrame,
    path: str,
    drop_null_fields: bool = False,
    mode: str = "overwrite",
    nan_sentinel_arrays: Iterable[str] = (),
) -> None:
    """S5/S6 ``writeJsonLists``: compact JSON-lines part-files.

    ``drop_null_fields=True`` reproduces the sparse-record outputs of the
    TSV pipelines (absent key omitted); ``False`` preserves explicit nulls
    as the JSON pipeline requires (SURVEY.md §1.5).
    ``nan_sentinel_arrays``: numeric-array columns to render with the
    reference's literal ``"nan"`` elements (see :func:`nan_sentinel_array`).
    """
    sentinel_cols = [c for c in nan_sentinel_arrays if c in df.columns]
    if sentinel_cols:
        df = df.withColumns({c: nan_sentinel_array(F.col(c)) for c in sentinel_cols})
    (
        df.write.mode(mode)
        .option("ignoreNullFields", "true" if drop_null_fields else "false")
        .json(path)
    )
