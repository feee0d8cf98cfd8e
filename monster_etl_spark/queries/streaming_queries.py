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
from monster_etl_spark.scratch import scratch_path

# staged OUTSIDE the repo tree; see monster_etl_spark.scratch for the
# shared-FS contract this path must satisfy on a multi-node cluster
_STAGE = scratch_path("stream_events")
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


_SLIDE_WINDOW = "30 minutes"
_SLIDE_STEP = "15 minutes"


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked SLIDING-window counts (30-minute windows every 15
    minutes) over a finite event stream driven to completion — each
    event contributes to exactly two overlapping windows, which is the
    state-expansion behavior tumbling windows never exercise. Append
    emissions are the windows closed under the final watermark; the
    oracle expands each event into its two window starts and applies
    the same closure rule."""
    from monster_etl_spark.streaming.pipeline import sliding_event_counts

    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    stage = _STAGE + "_slide"
    shutil.rmtree(stage, ignore_errors=True)
    e.coalesce(4).write.mode("overwrite").json(stage)

    stream = spark.readStream.schema(_STREAM_SCHEMA).option("maxFilesPerTrigger", 1).json(stage)
    out = sliding_event_counts(
        stream, window=_SLIDE_WINDOW, slide=_SLIDE_STEP, watermark=_DELAY
    )
    out = out.withColumn("window_start", F.col("window_start").cast("timestamp_ntz"))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_sliding_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    return spark.table("stream_sliding_counts")


STREAM_SLIDING_SQL = f"""
WITH mx AS (SELECT max(ts) AS m FROM events),
w AS (
  -- every event is in exactly two 30-min windows on the 15-min grid:
  -- starts time_bucket(15min, ts) and time_bucket(15min, ts) - 15min
  SELECT time_bucket(INTERVAL '{_SLIDE_STEP}', ts) - k * INTERVAL '{_SLIDE_STEP}'
           AS window_start,
         event_type, value
  FROM events, unnest([0, 1]) AS t(k)
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM w
GROUP BY 1, 2
HAVING window_start + INTERVAL '{_SLIDE_WINDOW}' <= (SELECT m - INTERVAL '{_DELAY}' FROM mx)
"""


_SESS_GAP_MIN = 30  # same gap as the batch q_sessionize / q_session_paths
_SESS_DELAY = "60 minutes"


def stream_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session-path analysis driven to completion (the streaming
    twin q_session_paths lacked, round-2 VERDICT #7): gap sessionization
    via the built-in session window, each closed session emitting its
    ordered event-type path. Append mode + final watermark = max(ts) -
    delay makes the emitted set deterministic, so the oracle mirrors the
    batch gap rule and keeps only sessions whose window end clears the
    final watermark."""
    from monster_etl_spark.streaming.pipeline import session_paths_stream

    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    stage = _STAGE + "_paths"
    shutil.rmtree(stage, ignore_errors=True)
    # session starts are raw event times: stage with FULL microsecond
    # precision (the JSON default truncates to milliseconds, which the
    # tumbling query never notices because its windows start on 15-minute
    # boundaries)
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    e.coalesce(4).write.mode("overwrite").option("timestampNTZFormat", fmt).json(stage)

    stream = (
        spark.readStream.schema(_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("timestampFormat", fmt)
        .json(stage)
    )
    out = session_paths_stream(stream, gap_minutes=_SESS_GAP_MIN, watermark=_SESS_DELAY)
    out = out.withColumn("session_start", F.col("session_start").cast("timestamp_ntz"))
    q = (
        out.writeStream.format("memory")
        .queryName("stream_session_paths")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    return spark.table("stream_session_paths")


# batch mirror of the stream: same strictly-greater gap rule as
# q_session_paths (the built-in session window merges inclusively at the
# window end, matching it), session window end = last_ts + gap, emitted
# iff end <= max(ts) - delay
STREAM_SESSION_PATHS_SQL = f"""
WITH mx AS (SELECT max(ts) AS m FROM events),
marked AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
           OR epoch(ts) - lag(epoch(ts)) OVER w > {_SESS_GAP_MIN * 60} THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
agg AS (
  SELECT user_id,
         min(ts) AS session_start,
         max(ts) AS last_ts,
         string_agg(event_type, '->' ORDER BY ts, event_id) AS path,
         count(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, session_start, path, n_events
FROM agg, mx
WHERE last_ts + INTERVAL '{_SESS_GAP_MIN} minutes' <= m - INTERVAL '{_SESS_DELAY}'
"""


QUERIES = {
    "stream_tumbling_counts": QuerySpec(
        stream_tumbling_counts,
        STREAM_TUMBLING_SQL,
        "watermarked streaming tumbling agg, driven to completion",
    ),
    "stream_session_paths": QuerySpec(
        stream_session_paths,
        STREAM_SESSION_PATHS_SQL,
        "streaming session-window path analysis, driven to completion",
    ),
    "stream_sliding_counts": QuerySpec(
        stream_sliding_counts,
        STREAM_SLIDING_SQL,
        "watermarked streaming sliding-window agg (overlapping state)",
    ),
}


def stream_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup driven to completion: the streaming twin of
    ``dedup_exact`` / A2 ``distinctBy``. The stream carries only the key
    projection (user_id, event_type) and ``dropDuplicates`` emits each
    key exactly once, on first sight — so the completed emission set IS
    the distinct-key set, deterministic regardless of file arrival order
    (which row of a key wins is arrival-dependent; the key itself never
    is). State is one entry per distinct key — exact dedup's floor; the
    bounded-state variant (``dropDuplicatesWithinWatermark``, state
    evicted at the watermark at the cost of re-admitting late repeats) is
    ``streaming/pipeline.py::stream_dedup``, batch-parity-tested in
    ``tests/test_streaming.py``."""
    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    stage = _STAGE + "_dedup"
    shutil.rmtree(stage, ignore_errors=True)
    e.coalesce(4).write.mode("overwrite").json(stage)

    stream = spark.readStream.schema(_STREAM_SCHEMA).option("maxFilesPerTrigger", 1).json(stage)
    out = stream.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("stream_exact_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    return spark.table("stream_exact_dedup")


STREAM_EXACT_DEDUP_SQL = "SELECT DISTINCT user_id, event_type FROM events"

QUERIES["stream_exact_dedup"] = QuerySpec(
    stream_exact_dedup,
    STREAM_EXACT_DEDUP_SQL,
    "streaming exact dedup (dropDuplicates), driven to completion",
)


def stream_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min sketch, driven to completion: the d x w cell
    counts are a streaming groupBy aggregate maintained incrementally
    across micro-batches (complete output mode re-emits the full — at
    most d*w-row — state each trigger; the memory sink holds the final
    snapshot). CMS cells are pure additive counters, so the completed
    state is EXACTLY the batch sketch regardless of how the stream was
    split into batches — the mergeability that makes CMS the standard
    streaming frequency sketch — and the oracle is the same cells SQL
    the batch q_heavy_hitters_cms builds on. State is bounded by d*w
    cells forever (no watermark needed): the sketch IS the eviction
    strategy."""
    from monster_etl_spark.operators.sketches import cms_build

    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    stage = _STAGE + "_cms"
    shutil.rmtree(stage, ignore_errors=True)
    e.coalesce(4).write.mode("overwrite").json(stage)

    stream = spark.readStream.schema(_STREAM_SCHEMA).option("maxFilesPerTrigger", 1).json(stage)
    # the batch sketch builder works unchanged on a streaming frame —
    # one code path, so the batch/stream sketches cannot drift
    agg = cms_build(stream, "user_id")
    q = (
        agg.writeStream.format("memory")
        .queryName("stream_cms_sketch")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    return spark.table("stream_cms_sketch")


def _stream_cms_sql() -> str:
    from monster_etl_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH, _bucket_sql

    cells = " UNION ALL ".join(
        f"SELECT {r} AS sketch_row, {_bucket_sql('user_id', r, CMS_WIDTH)} AS bucket FROM events"
        for r in range(CMS_DEPTH)
    )
    return f"""
SELECT sketch_row, bucket, CAST(COUNT(*) AS BIGINT) AS cell_count
FROM ({cells}) AS cells GROUP BY sketch_row, bucket
"""


QUERIES["stream_cms_sketch"] = QuerySpec(
    stream_cms_sketch,
    _stream_cms_sql(),
    "streaming count-min sketch; completed state == batch sketch",
)


_JOIN_DELAY = "60 minutes"
_JOIN_GAP_MIN = 15


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join driven to completion: the
    view->purchase attribution funnel (purchase by the same user within
    15 minutes of a view), both sides read from the SAME staged event
    stream and filtered per side. The bounded time condition is what
    lets both join buffers expire (state-safe at scale:
    streaming/joins.py::stream_stream_join); an INNER join emits each
    pair as soon as both sides have arrived, so the completed emission
    set is exactly the batch interval join as long as no event arrives
    more than the 60-minute watermark late (the staged files preserve
    rough time order; the generous delay absorbs the residual disorder)
    - which makes the full pair set oracle-checkable in DuckDB."""
    from monster_etl_spark.streaming.joins import stream_stream_join

    e = load(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    stage = _STAGE + "_ivjoin"
    shutil.rmtree(stage, ignore_errors=True)
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    e.coalesce(4).write.mode("overwrite").option("timestampNTZFormat", fmt).json(stage)

    def _side(event_type):
        return (
            spark.readStream.schema(_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("timestampFormat", fmt)
            .json(stage)
            .filter(F.col("event_type") == event_type)
        )

    joined = stream_stream_join(
        _side("view"),
        _side("purchase"),
        on="user_id",
        watermark=_JOIN_DELAY,
        max_gap_minutes=_JOIN_GAP_MIN,
    )
    out = joined.select(
        F.col("l.event_id").alias("view_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        (F.unix_micros(F.col("r.ts")) - F.unix_micros(F.col("l.ts"))).alias("lag_us"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("stream_interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if q.isActive:
            q.stop()
    return spark.table("stream_interval_join")


STREAM_INTERVAL_JOIN_SQL = f"""
SELECT v.event_id AS view_id,
       p.event_id AS purchase_id,
       v.user_id AS user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
FROM events v
JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL '{_JOIN_GAP_MIN} minutes'
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
"""

QUERIES["stream_interval_join"] = QuerySpec(
    stream_interval_join,
    STREAM_INTERVAL_JOIN_SQL,
    "watermarked stream-stream interval join (view->purchase funnel)",
)
