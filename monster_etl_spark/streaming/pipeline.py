"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.7) — this module is the
green-field streaming counterpart built on Spark Structured Streaming:
file/json sources, watermarked tumbling-window aggregation (the incremental
twin of ``queries.events_queries.q_tumbling_window``), within-watermark
dedup, and gap sessionization via session windows.

Scale posture: state stores partition by the grouping key; watermarks bound
state size (late data beyond the watermark is dropped deterministically);
``dropDuplicatesWithinWatermark`` keeps the dedup state window-bounded.
Gap sessionization uses the built-in session window; the custom-state
surface (``applyInPandasWithState``) lives in ``streaming.stateful``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_json_stream(
    spark: SparkSession, path: str, schema: T.StructType = EVENT_SCHEMA
) -> DataFrame:
    """File-based streaming source: JSON-lines dropped into a directory.
    Schema is mandatory for streaming reads (no inference race)."""
    return spark.readStream.schema(schema).json(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — identical
    aggregation to the batch ``q_tumbling_window``; the watermark bounds
    aggregation state and admits late data up to the bound."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # same exact-decimal discipline as the batch twin: raw double
            # summation is partition-order dependent and would make a
            # streaming backfill disagree with q_tumbling_window
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked SLIDING-window counts per event type: each event lands
    in ``window/slide`` overlapping windows (Spark expands the window
    spec into that many rows of state per key). Same exact-decimal
    discipline as the tumbling twin; the watermark closes a window once
    it passes ``window_end + delay``, so append-mode emissions over a
    finite stream are deterministic."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def stream_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact-dedup on event identity within the watermark window —
    the streaming twin of A2 ``distinctBy`` with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "60 minutes",
) -> DataFrame:
    """Streaming gap-based sessionization using the built-in session window
    (state-backed, merges windows closer than the gap). Batch twin:
    ``queries.events_queries.q_sessionize``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def session_paths_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "60 minutes",
) -> DataFrame:
    """Streaming twin of ``queries.events_queries.q_session_paths``' path
    derivation: one row per CLOSED session carrying its ordered event-type
    path. Append mode — a session emits when the watermark passes its end,
    so state is bounded by (open sessions x watermark) like any session
    aggregate.

    Gap-rule parity: the batch query starts a new session only when the
    gap is STRICTLY greater than ``gap_minutes``. The built-in session
    window merges INCLUSIVELY at the window end (an event exactly ``gap``
    after the last one still merges — verified empirically, pinned by
    ``test_session_paths_stream_gap_rule_matches_batch``), which is
    exactly the batch rule; no gap adjustment is needed.

    Path determinism: ``collect_list`` order is not guaranteed, so events
    sort by (ts, event_id) inside the aggregate, exactly as the batch twin.

    The top-N path COUNT is deliberately absent: it is a second, unbounded
    aggregation, which append mode cannot stack on a session aggregate —
    count the emitted rows in the sink/batch layer (the standard split;
    see queries/streaming_queries.py::stream_session_paths' oracle).
    """
    gap = f"{gap_minutes} minutes"
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.array_join(
                F.transform("evs", lambda s: s.getField("event_type")), "->"
            ).alias("path"),
            "n_events",
        )
    )


def minhash_signature_col(text: Column) -> Column:
    """Per-ROW MinHash signature as a string key — the streaming-safe
    formulation. The batch operators (operators/dedup.py) explode shingles
    and groupBy-aggregate because the inverted index needs (doc, shingle)
    rows anyway; a stream cannot afford per-doc aggregation state, so here
    each permutation's minimum runs as a higher-order ``array_min`` over
    the in-row shingle array: a NARROW projection, no shuffle, no state.
    Same md5 base hash + affine permutations (shared constants), so batch
    and stream signatures agree bit-for-bit for the same text."""
    from monster_etl_spark.operators.dedup import (
        MINHASH_AB,
        MINHASH_PRIME,
        shingles,
    )

    sh = shingles(text)
    base = F.transform(
        sh, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )
    mins = [
        F.array_min(F.transform(base, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME))
        for a, b in MINHASH_AB
    ]
    return F.concat_ws("|", *[m.cast("string") for m in mins])


def stream_dedup_near(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming NEAR-duplicate dedup: drop any document whose full
    MinHash signature was already seen inside the watermark window.
    Signature-exact matching is the high-threshold point of the MinHash
    family (all bands agree — stricter than the batch LSH candidate
    join, no false positives at the signature level); state is one row
    per distinct signature, bounded by the watermark exactly like the
    built-in exact dedup. Empty/sub-shingle texts hash to the empty
    signature and dedup among themselves — filter upstream if that is
    not wanted."""
    sig = minhash_signature_col(F.col(text_col))
    return (
        docs.withColumn("__sig__", sig)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__sig__"])
        .drop("__sig__")
    )
