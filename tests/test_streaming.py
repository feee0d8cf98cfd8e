"""Streaming surface tests: drive each streaming transformation end-to-end
with a file source and memory sink, including late-data handling under the
watermark."""

import json
import time

import pytest
from pyspark.sql import functions as F

from monster_etl_spark.streaming import (
    read_json_stream,
    sessionize_stream,
    stream_dedup,
    windowed_event_counts,
)


def _write_events(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _run_stream(df, out_name, mode):
    q = df.writeStream.format("memory").queryName(out_name).outputMode(mode).start()
    q.processAllAvailable()
    return q


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "stream_in"
    d.mkdir()
    _write_events(
        d / "batch1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:01:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:05:00", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},
            {"event_id": 3, "ts": "2024-01-01T00:20:00", "user_id": 2, "event_type": "view", "value": 3.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:05:00", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},
            {"event_id": 4, "ts": "2024-01-01T02:00:00", "user_id": 1, "event_type": "click", "value": 4.0, "props": "{}"},
        ],
    )
    return str(d)


def test_windowed_counts(spark, events_dir):
    stream = read_json_stream(spark, events_dir)
    assert stream.isStreaming
    q = _run_stream(windowed_event_counts(stream), "win_counts", "complete")
    try:
        rows = {
            (r["window_start"].isoformat(), r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    assert rows[("2024-01-01T00:00:00", "click")] == (3, 5.0)
    assert rows[("2024-01-01T00:15:00", "view")] == (1, 3.0)
    assert rows[("2024-01-01T02:00:00", "click")] == (1, 4.0)


def test_stream_dedup(spark, events_dir):
    stream = read_json_stream(spark, events_dir)
    q = _run_stream(stream_dedup(stream), "dedup_out", "append")
    try:
        ids = sorted(r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect())
    finally:
        q.stop()
    # duplicate event_id 2 dropped within the watermark
    assert ids == [1, 2, 3, 4]


def test_sessionize_stream(spark, events_dir):
    stream = read_json_stream(spark, events_dir)
    q = _run_stream(sessionize_stream(stream), "sessions_out", "complete")
    try:
        rows = sorted(
            (r["user_id"], r["session_start"].isoformat(), r["n_events"])
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        )
    finally:
        q.stop()
    # user 1: events at 00:01/00:05 (incl. the duplicate row — sessionize
    # does not dedup) merge into one session; 02:00 is separate
    assert rows == [
        (1, "2024-01-01T00:01:00", 3),
        (1, "2024-01-01T02:00:00", 1),
        (2, "2024-01-01T00:20:00", 1),
    ]


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """Drive the watermark: a second file with an event far behind the
    advanced watermark must not re-open its window in append mode."""
    d = tmp_path / "late_in"
    d.mkdir()
    _write_events(
        d / "b1.json",
        [{"event_id": 1, "ts": "2024-01-01T00:01:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"}],
    )
    stream = read_json_stream(spark, str(d))
    q = (
        windowed_event_counts(stream, window="15 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance watermark far past the first window
        _write_events(
            d / "b2.json",
            [{"event_id": 2, "ts": "2024-01-01T06:00:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"}],
        )
        q.processAllAvailable()
        # now a very late event for the long-closed first window
        _write_events(
            d / "b3.json",
            [{"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 1, "event_type": "click", "value": 9.0, "props": "{}"}],
        )
        q.processAllAvailable()
        rows = {
            (r["window_start"].isoformat(), r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM late_out").collect()
        }
    finally:
        q.stop()
    # first window emitted exactly once, without the late event's value
    assert ("2024-01-01T00:00:00", 1, 1.0) in rows
    assert not any(v == 9.0 or v == 10.0 for _, _, v in rows)


def test_stream_dedup_near_drops_signature_twins(spark, tmp_path):
    """Two documents with identical MinHash signatures (same shingle set,
    different doc ids) must collapse to one survivor; a genuinely
    different document must survive. Batch/stream signature agreement is
    asserted against the batch constants by construction (shared md5 +
    affine perms)."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from monster_etl_spark.streaming.pipeline import minhash_signature_col, stream_dedup_near

    # same token sequence -> same shingle set -> same signature;
    # the near-dup here is a pure duplicate paste with different id/ts
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_c = "a completely different document about spark structured streaming state"
    rows = [
        {"doc_id": 1, "ts": "2024-01-01T00:00:00", "text": text_a},
        {"doc_id": 2, "ts": "2024-01-01T00:00:30", "text": text_a},
        {"doc_id": 3, "ts": "2024-01-01T00:01:00", "text": text_c},
    ]
    # sanity: batch-side signatures computed with the same column agree
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], "doc_id: long, text: string"
    ).select("doc_id", minhash_signature_col(F.col("text")).alias("sig")).collect()
    sigs = {r["doc_id"]: r["sig"] for r in batch}
    assert sigs[1] == sigs[2] != sigs[3]

    d = tmp_path / "docs"
    d.mkdir()
    with open(d / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).json(str(d))
    q = (
        stream_dedup_near(stream)
        .writeStream.format("memory")
        .queryName("near_dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            r["doc_id"] for r in spark.sql("SELECT doc_id FROM near_dedup_out").collect()
        )
    finally:
        q.stop()
    assert got == [1, 3], got


def test_session_paths_stream_gap_rule_matches_batch(spark, tmp_path):
    """The batch rule starts a new session only when the gap is STRICTLY
    greater than 30 minutes; the stream's +1us session window must merge
    an exactly-30-minute gap (same session) and split 30min+1us (new
    session) — the knife-edge where a naive session_window diverges from
    q_session_paths."""
    from monster_etl_spark.streaming import read_json_stream, session_paths_stream

    d = tmp_path / "paths_in"
    d.mkdir()
    _write_events(
        d / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "a", "value": 0.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:30:00", "user_id": 1, "event_type": "b", "value": 0.0, "props": "{}"},
            {"event_id": 3, "ts": "2024-01-01T01:00:00.000001", "user_id": 1, "event_type": "c", "value": 0.0, "props": "{}"},
        ],
    )
    # sentinel far in the future: advances the watermark so every real
    # session closes and emits in append mode (its own session never does)
    _write_events(
        d / "b2.json",
        [{"event_id": 99, "ts": "2024-01-02T00:00:00", "user_id": 99, "event_type": "z", "value": 0.0, "props": "{}"}],
    )
    stream = spark.readStream.schema(
        read_json_stream(spark, str(d)).schema
    ).option("maxFilesPerTrigger", 1).json(str(d))
    q = _run_stream(session_paths_stream(stream), "paths_out", "append")
    try:
        rows = sorted(
            (r["user_id"], r["path"], r["n_events"])
            for r in spark.sql("SELECT * FROM paths_out").collect()
        )
    finally:
        q.stop()
    # exactly-30min gap merged (a->b), +1us split (c); sentinel unflushed
    assert rows == [(1, "a->b", 2), (1, "c", 1)], rows


def test_session_paths_stream_state_survives_restart(spark, tmp_path):
    """A session OPEN across a stop/restart must keep accumulating: events
    before the restart and after it land in one session whose path shows
    all of them — the checkpoint-recovery contract for session state."""
    from monster_etl_spark.streaming import read_json_stream, session_paths_stream

    d = tmp_path / "restart_in"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_events(
        d / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 5, "event_type": "x", "value": 0.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:10:00", "user_id": 5, "event_type": "y", "value": 0.0, "props": "{}"},
        ],
    )
    schema = read_json_stream(spark, str(d)).schema

    def start():
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(d))
        return (
            session_paths_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # post-restart: an event EXTENDING the open session, plus the flush sentinel
    _write_events(
        d / "b2.json",
        [
            {"event_id": 3, "ts": "2024-01-01T00:20:00", "user_id": 5, "event_type": "z", "value": 0.0, "props": "{}"},
            {"event_id": 99, "ts": "2024-01-02T00:00:00", "user_id": 99, "event_type": "q", "value": 0.0, "props": "{}"},
        ],
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = [(r["user_id"], r["path"], r["n_events"])
            for r in spark.read.parquet(out).collect()]
    assert rows == [(5, "x->y->z", 3)], rows


def test_sliding_counts_overlapping_windows(spark, events_dir):
    from monster_etl_spark.streaming.pipeline import sliding_event_counts

    stream = read_json_stream(spark, events_dir)
    q = _run_stream(
        sliding_event_counts(stream, "30 minutes", "15 minutes"), "slide_counts", "complete"
    )
    try:
        rows = {
            (r["window_start"].isoformat(), r["event_type"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM slide_counts").collect()
        }
    finally:
        q.stop()
    # clicks at 00:01 (1.0) and 00:05 (2.0, written TWICE in the fixture
    # for the dedup test — sliding agg keeps both) land in windows
    # [23:45,00:15) and [00:00,00:30); the 00:20 view lands in
    # [00:00,00:30) and [00:15,00:45)
    assert rows[("2023-12-31T23:45:00", "click")] == (3, 5.0)
    assert rows[("2024-01-01T00:00:00", "click")] == (3, 5.0)
    assert rows[("2024-01-01T00:00:00", "view")] == (1, 3.0)
    assert rows[("2024-01-01T00:15:00", "view")] == (1, 3.0)
    # every event appears in exactly window/slide = 2 windows
    total = sum(n for n, _ in rows.values())
    assert total == 2 * 5
