"""Streaming joins and sinks.

- stream-static enrichment: the static (dimension) side is re-read per
  micro-batch and broadcast — the standard pattern for slowly-refreshing
  lookup tables.
- stream-stream inner join: both sides watermarked; the time-bound join
  condition lets the engine expire buffered state (without it, state grows
  forever).
- foreachBatch upsert sink: applies ``merge_upsert`` per micro-batch to
  maintain a parquet snapshot — batch and streaming share the exact same
  merge operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(events: DataFrame, dim: DataFrame, on: str, how: str = "left") -> DataFrame:
    """Stream-static join: ``dim`` is a batch DataFrame; Spark re-plans the
    static side each micro-batch (picking broadcast when small)."""
    return events.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "30 minutes",
    max_gap_minutes: int = 15,
) -> DataFrame:
    """Watermarked stream-stream inner join with a bounded time condition —
    the bound is what lets both sides' buffers expire (state-safe at scale).
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        )
    )
    return l.join(r, cond, "inner")


def upsert_sink(stream: DataFrame, target_path: str, key: str, precedence: str, checkpoint: str):
    """foreachBatch sink maintaining a latest-wins parquet snapshot.

    Each micro-batch merges into the current snapshot with the same
    ``merge_upsert`` operator the batch engine uses. The write is
    tmp-then-rename per batch (snapshot missing only between two renames,
    never during a delete); truly transactional swaps need a table format
    (Iceberg/Delta), where this becomes a real MERGE.
    """
    import os
    import shutil

    from pyspark.errors import AnalysisException

    from monster_etl_spark.operators.maintenance import merge_upsert

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            current = spark.read.parquet(target_path)
            merged = merge_upsert(current, batch_df, key, precedence)
        except AnalysisException as exc:
            # ONLY path-not-found means "first batch"; any other failure
            # (corrupt file, schema drift) must abort the batch — a broad
            # except here would silently replace the snapshot with one batch
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise
            merged = batch_df
        # write-to-tmp + retire-then-replace swap: stays distributed (no
        # driver collect), never reads and overwrites one path in a job,
        # and the snapshot is missing only between the two renames (not
        # for a whole directory delete). Not transactional — a table
        # format (Iceberg/Delta) is the real MERGE at scale.
        tmp = target_path.rstrip("/") + f".tmp-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = target_path.rstrip("/") + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(target_path):
            os.replace(target_path, old)
        os.replace(tmp, target_path)
        if os.path.isdir(old):
            shutil.rmtree(old)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .start()
    )
