"""File-manifest data skipping over plain parquet (the metadata half of a
table format, without the table format).

``build_manifest`` collects per-file, per-column min/max/null statistics
from parquet FOOTERS into a small manifest DataFrame — footer reads are
distributed over executors via ``mapInPandas`` (pyarrow opens only the
footer, never the data pages), so manifesting a 100 TB table costs one
metadata round per file, embarrassingly parallel. Listing the files is a
driver-side metadata operation, exactly as in Iceberg/Delta where the
manifest itself lives driver/metastore-side.

``pruned_paths`` evaluates range predicates against the manifest and
returns only the files whose [min, max] band overlaps every predicate —
the same file-skipping a table format's planner does. Combined with
``maintenance.zorder_layout`` (which makes those bands narrow on every
participating column) this is the full 100 TB scan-pruning loop:
OPTIMIZE-style rewrite -> manifest -> skip.

Stats are kept as doubles (numeric columns only): the pruning decision
band-overlaps, so widening min/max to double is safe (never prunes a
file it shouldn't)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("column", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_nulls", T.LongType()),
        T.StructField("vmin", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)


def _list_part_files(path: str) -> list[str]:
    import glob as _glob
    import os

    if os.path.isdir(path):
        return sorted(_glob.glob(os.path.join(path, "part-*.parquet")))
    return sorted(_glob.glob(path))


def build_manifest(spark: SparkSession, path: str, columns: list[str]) -> DataFrame:
    """(file, column, n_rows, n_nulls, vmin, vmax) per data file — footer
    stats only, read on executors. Non-numeric or stat-less columns get
    null bands (never pruned)."""
    files = _list_part_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet part files under {path!r}")
    cols = list(columns)  # ship by value into the closure

    def _scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                agg: dict[str, list] = {c: [0, None, None] for c in cols}
                n_rows = md.num_rows
                for rg in range(md.num_row_groups):
                    row = md.row_group(rg)
                    for i in range(row.num_columns):
                        col = row.column(i)
                        name = col.path_in_schema
                        if name not in agg:
                            continue
                        st = col.statistics
                        if st is None:
                            continue
                        slot = agg[name]
                        slot[0] += st.null_count or 0
                        try:
                            lo, hi = float(st.min), float(st.max)
                        except (TypeError, ValueError):
                            continue
                        slot[1] = lo if slot[1] is None else min(slot[1], lo)
                        slot[2] = hi if slot[2] is None else max(slot[2], hi)
                for c in cols:
                    nulls, lo, hi = agg[c]
                    out.append((f, c, n_rows, nulls, lo, hi))
            yield pd.DataFrame(
                out, columns=["file", "column", "n_rows", "n_nulls", "vmin", "vmax"]
            )

    files_df = spark.createDataFrame([(f,) for f in files], "file: string")
    # one small task per file batch; footer-only IO
    return files_df.repartition(min(len(files), 64)).mapInPandas(_scan, MANIFEST_SCHEMA)


def pruned_paths(manifest: DataFrame, predicates: dict[str, tuple[float, float]]) -> list[str]:
    """Files whose stats band overlaps EVERY ``col: (lo, hi)`` predicate.
    A file missing stats for a predicate column is kept (cannot prove it
    prunable) — the manifest can only skip, never lose rows. The manifest
    is metadata-sized (files x columns), so the driver collect here is the
    planner's normal file-listing cost, not a data collect."""
    keep = None
    for c, (lo, hi) in predicates.items():
        m = manifest.filter(F.col("column") == c)
        ok = m.filter(
            F.col("vmin").isNull()
            | F.col("vmax").isNull()
            | ((F.col("vmax") >= lo) & (F.col("vmin") <= hi))
        ).select("file")
        keep = ok if keep is None else keep.join(ok, "file")
    if keep is None:
        return sorted(r["file"] for r in manifest.select("file").distinct().collect())
    return sorted(r["file"] for r in keep.distinct().collect())


def pruned_read(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    predicates: dict[str, tuple[float, float]],
) -> DataFrame:
    """Read only the manifest-surviving files, with the predicates
    re-applied as ordinary filters (file skipping is a superset guarantee;
    row-level filtering still belongs to the scan, where it also rides
    parquet row-group pushdown)."""
    paths = pruned_paths(manifest, predicates)
    if not paths:
        # no file can match: an empty frame with the right schema
        df = spark.read.parquet(path)
        cond = F.lit(False)
        return df.filter(cond)
    df = spark.read.parquet(*paths)
    for c, (lo, hi) in predicates.items():
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df
