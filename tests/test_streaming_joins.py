"""Streaming joins, foreachBatch upsert sink, and checkpoint recovery."""

import json

from pyspark.sql import functions as F

from monster_etl_spark.streaming import read_json_stream
from monster_etl_spark.streaming.joins import enrich_stream, stream_stream_join, upsert_sink


def _write(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _ev(eid, ts, uid, typ="c", value=1.0):
    return {"event_id": eid, "ts": ts, "user_id": uid, "event_type": typ, "value": value, "props": "{}"}


def test_stream_static_enrichment(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write(d / "b1.json", [_ev(1, "2024-01-01T00:00:00", 1), _ev(2, "2024-01-01T00:01:00", 99)])
    dim = spark.createDataFrame([(1, "gold")], "user_id bigint, tier string")
    q = (
        enrich_stream(read_json_stream(spark, str(d)), dim, "user_id")
        .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        rows = {r["event_id"]: r["tier"] for r in spark.sql("SELECT * FROM enriched").collect()}
    finally:
        q.stop()
    assert rows == {1: "gold", 2: None}


def test_stream_stream_join_within_bound(spark, tmp_path):
    la, ra = tmp_path / "l", tmp_path / "r"
    la.mkdir(), ra.mkdir()
    _write(la / "b1.json", [_ev(1, "2024-01-01T00:00:00", 1), _ev(2, "2024-01-01T01:00:00", 2)])
    # match for user 1 within 15 min; user 2's is 30 min later -> no match
    _write(ra / "b1.json", [_ev(10, "2024-01-01T00:10:00", 1), _ev(20, "2024-01-01T01:30:00", 2)])
    l = read_json_stream(spark, str(la)).select("user_id", "ts", F.col("event_id").alias("l_id"))
    r = read_json_stream(spark, str(ra)).select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"), F.col("event_id").alias("r_id")
    ).withColumnsRenamed({"r_user": "user_id"})
    joined = stream_stream_join(
        l.select("user_id", "ts", "l_id"),
        r.select("user_id", F.col("r_ts").alias("ts"), "r_id"),
        on="user_id",
    )
    q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try:
        q.processAllAvailable()
        pairs = {(r["l_id"], r["r_id"]) for r in spark.sql("SELECT * FROM ssj").collect()}
    finally:
        q.stop()
    assert pairs == {(1, 10)}


def test_foreachbatch_upsert_and_checkpoint_recovery(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    _write(src / "b1.json", [_ev(1, "2024-01-01T00:00:00", 1, value=1.0)])

    def start():
        stream = read_json_stream(spark, str(src)).select("event_id", "user_id", "value", "ts")
        return upsert_sink(stream, target, key="event_id", precedence="ts", checkpoint=ckpt)

    q = start()
    q.processAllAvailable()
    q.stop()
    snap1 = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert snap1 == {1: 1.0}

    # update for key 1 (later ts) + new key 2, then RESTART from checkpoint
    _write(src / "b2.json", [_ev(1, "2024-01-01T02:00:00", 1, value=9.0), _ev(2, "2024-01-01T02:01:00", 2, value=5.0)])
    q = start()
    q.processAllAvailable()
    q.stop()
    snap2 = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert snap2 == {1: 9.0, 2: 5.0}

    # restart again with NO new data: checkpoint must prevent reprocessing
    q = start()
    q.processAllAvailable()
    q.stop()
    snap3 = {r["event_id"]: r["value"] for r in spark.read.parquet(target).collect()}
    assert snap3 == snap2
