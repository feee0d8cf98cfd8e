"""Driver-checkable Structured Streaming query.

A finite file stream driven to completion with ``availableNow`` is
deterministic: the final watermark is ``max(ts) - delay``, and append mode
emits exactly the windows that closed under it. That makes the streaming
pipeline's OUTPUT (not just its plumbing) oracle-checkable — the DuckDB
mirror computes the same tumbling aggregation and keeps only windows whose
end <= max(ts) - delay.

The stream stages the events table as JSON-lines in the scratch dir
(idempotent), reads it back as a 4-file stream with
``maxFilesPerTrigger=1`` so the watermark genuinely advances across
micro-batches (a single-batch run would exercise nothing), and lands in a
memory sink.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from monster_etl_spark.queries import QuerySpec, load

_STAGE = "/root/repo/spark-warehouse/stream_events"
_WINDOW = "15 minutes"
_DELAY = "30 minutes"

_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),  # watermarks require TIMESTAMP
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling counts over a finite event stream, driven to
    completion. Returns the append-mode emissions: one row per closed
    (window, event_type)."""
    from monster_etl_spark.streaming.pipeline import windowed_event_counts

    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    shutil.rmtree(_STAGE, ignore_errors=True)
    e.coalesce(4).write.mode("overwrite").json(_STAGE)

    stream = spark.readStream.schema(_STREAM_SCHEMA).option("maxFilesPerTrigger", 1).json(_STAGE)
    out = windowed_event_counts(stream, window=_WINDOW, watermark=_DELAY)
    # back to ntz at the boundary so the result frame matches the batch
    # twin / oracle representation for any session timezone
    out = out.withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_tumbling_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    return spark.table("stream_tumbling_counts")


STREAM_TUMBLING_SQL = f"""
WITH mx AS (SELECT max(ts) AS m FROM events)
SELECT time_bucket(INTERVAL '{_WINDOW}', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
HAVING window_start + INTERVAL '{_WINDOW}' <= (SELECT m - INTERVAL '{_DELAY}' FROM mx)
"""


QUERIES = {
    "stream_tumbling_counts": QuerySpec(
        stream_tumbling_counts,
        STREAM_TUMBLING_SQL,
        "watermarked streaming tumbling agg, driven to completion",
    ),
}
