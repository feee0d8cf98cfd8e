"""applyInPandasWithState: state must persist across micro-batches."""

import json

from monster_etl_spark.streaming import read_json_stream
from monster_etl_spark.streaming.stateful import running_user_totals


def _write(path, events):
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_running_totals_across_batches(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write(
        d / "b1.json",
        [
            {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 1, "event_type": "c", "value": 2.0, "props": "{}"},
            {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 1, "event_type": "c", "value": 3.0, "props": "{}"},
            {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 2, "event_type": "c", "value": 10.0, "props": "{}"},
        ],
    )
    q = (
        running_user_totals(read_json_stream(spark, str(d)))
        .writeStream.format("memory")
        .queryName("running_out")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM running_out").collect()
        }
        assert first == {1: (2, 5.0), 2: (1, 10.0)}

        # second micro-batch: state must accumulate, not reset
        _write(
            d / "b2.json",
            [{"event_id": 4, "ts": "2024-01-01T00:03:00", "user_id": 1, "event_type": "c", "value": 5.0, "props": "{}"}],
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM running_out").collect()
        # update mode appends the new snapshot for user 1
        latest_u1 = max(
            ((r["n_events"], r["total_value"]) for r in rows if r["user_id"] == 1)
        )
        assert latest_u1 == (3, 10.0)
    finally:
        q.stop()


def test_streaming_funnel_matches_batch(spark, tmp_path, sf_dir):
    """Batch/stream parity: replay the fixture event log as a stream and
    the per-user furthest-step distribution must equal the batch funnel's
    step counts (first-touch strictly-after semantics on both paths)."""
    from pyspark.sql import functions as F

    from monster_etl_spark.queries import load
    from monster_etl_spark.queries.events_queries import FUNNEL_STEPS, q_funnel
    from monster_etl_spark.streaming.stateful import streaming_funnel

    # replay fixture events as two micro-batches (split by event_id parity)
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")
    d = tmp_path / "replay"
    d.mkdir()
    for i, half in enumerate((ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 = 1"))):
        rows = half.select(
            "user_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
            "event_type",
        ).collect()
        _write(
            d / f"b{i}.json",
            [
                {"user_id": r["user_id"], "ts": r["ts"], "event_type": r["event_type"]}
                for r in rows
            ],
        )

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        streaming_funnel(stream, FUNNEL_STEPS)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # latest snapshot per user across all update rows
        snap = {}
        for r in spark.sql("SELECT * FROM funnel_out").collect():
            snap[r["user_id"]] = max(snap.get(r["user_id"], 0), r["furthest_step"])
    finally:
        q.stop()

    got = {
        step: sum(1 for v in snap.values() if v >= step) for step in (1, 2, 3)
    }
    batch = {r["step"]: r["users"] for r in q_funnel(spark, sf_dir).collect()}
    assert got == batch, (got, batch)


def test_funnel_late_earlier_upstream_across_batches(spark, tmp_path):
    """Cross-batch re-validation (round-2 ADVICE): batch 1 delivers
    step-2/3 events then a LATER step-1, so nothing downstream is valid;
    batch 2 delivers a late-but-EARLIER step-1. The stored candidate
    times from batch 1 must become valid retroactively — the batch funnel
    over the union would report furthest_step 3, and the stream must
    agree on any micro-batch slicing."""
    from pyspark.sql import types as T

    from monster_etl_spark.streaming.stateful import streaming_funnel

    d = tmp_path / "late"
    d.mkdir()
    _write(
        d / "b1.json",
        [
            {"user_id": 1, "ts": "2024-01-01T00:00:50", "event_type": "click"},
            {"user_id": 1, "ts": "2024-01-01T00:01:00", "event_type": "purchase"},
            {"user_id": 1, "ts": "2024-01-01T00:01:40", "event_type": "signup"},
        ],
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(d))
    q = (
        streaming_funnel(stream, ("signup", "click", "purchase"))
        .writeStream.format("memory")
        .queryName("late_funnel_out")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        first = [r["furthest_step"] for r in spark.sql("SELECT * FROM late_funnel_out").collect()]
        assert first == [1], first  # signup after click/purchase: only step 1

        # batch 2: late signup EARLIER than the stored click/purchase times
        _write(
            d / "b2.json",
            [{"user_id": 1, "ts": "2024-01-01T00:00:10", "event_type": "signup"}],
        )
        q.processAllAvailable()
        snap = max(
            r["furthest_step"] for r in spark.sql("SELECT * FROM late_funnel_out").collect()
        )
        assert snap == 3, "late-earlier step-1 must re-validate stored step-2/3 events"
    finally:
        q.stop()


def test_stateful_state_survives_restart(spark, tmp_path):
    """Stop the query after batch 1, restart from the same checkpoint,
    feed batch 2: per-user state must carry across the restart (the
    recovery contract a 100 TB pipeline leans on after executor loss or
    redeploy)."""
    d = tmp_path / "in"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write(
        d / "b1.json",
        [{"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7, "event_type": "c",
          "value": 2.0, "props": "{}"}],
    )

    out = str(tmp_path / "out")

    def start():
        # memory sink cannot recover from a checkpoint; foreachBatch with a
        # durable (append) sink is the recovery-capable pattern
        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        return (
            running_user_totals(read_json_stream(spark, str(d)))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    _write(
        d / "b2.json",
        [{"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 7, "event_type": "c",
          "value": 5.0, "props": "{}"}],
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).collect()
    latest = max((r["n_events"], r["total_value"]) for r in rows if r["user_id"] == 7)
    assert latest == (2, 7.0), rows


def test_funnel_randomized_batch_splits_match_batch(spark, tmp_path):
    """Property-style cross-batch contract (round-3 verdict #8): for
    seeded random event logs — ties, out-of-order arrival, noise events,
    users missing steps — the streaming funnel's final per-user snapshot
    must equal the batch funnel (first-touch, strictly-after) on EVERY
    random micro-batch slicing. This pins the re-validation machinery
    (candidate pools) as exact, not approximate, below the documented
    _FUNNEL_MAX_CANDIDATES cap."""
    import random

    from pyspark.sql import types as T

    from monster_etl_spark.streaming.stateful import streaming_funnel

    STEPS = ("signup", "click", "purchase")

    def batch_reference(events):
        # first-touch strictly-after semantics, the q_funnel rule
        by_user = {}
        for u, t, et in events:
            by_user.setdefault(u, []).append((t, et))
        out = {}
        for u, evs in by_user.items():
            s1 = min((t for t, et in evs if et == STEPS[0]), default=None)
            s2 = (
                min((t for t, et in evs if et == STEPS[1] and t > s1), default=None)
                if s1 is not None
                else None
            )
            s3 = (
                min((t for t, et in evs if et == STEPS[2] and t > s2), default=None)
                if s2 is not None
                else None
            )
            furthest = 3 if s3 else (2 if s2 else (1 if s1 is not None else 0))
            if furthest:
                out[u] = furthest
        return out

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    types = list(STEPS) + ["noise"]
    for seed in (11, 23, 47):
        rng = random.Random(seed)
        events = [
            (
                u,
                rng.randrange(0, 40),  # coarse second grid -> frequent ties
                rng.choice(types),
            )
            for u in range(1, 9)
            for _ in range(rng.randrange(1, 12))
        ]
        rng.shuffle(events)  # out-of-order arrival
        n_batches = rng.randrange(1, 5)
        cuts = sorted(rng.randrange(0, len(events) + 1) for _ in range(n_batches - 1))
        slices = [
            events[a:b] for a, b in zip([0] + cuts, cuts + [len(events)])
        ]
        d = tmp_path / f"prop{seed}"
        d.mkdir()
        for i, sl in enumerate(slices):
            _write(
                d / f"b{i}.json",
                [
                    {
                        "user_id": u,
                        "ts": f"2024-01-01T00:00:{t:02d}" if t < 60 else None,
                        "event_type": et,
                    }
                    for u, t, et in sl
                ],
            )
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(d))
        )
        q = (
            streaming_funnel(stream, STEPS)
            .writeStream.format("memory")
            .queryName(f"prop_funnel_{seed}")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            snap = {}
            for r in spark.sql(f"SELECT * FROM prop_funnel_{seed}").collect():
                snap[r["user_id"]] = max(snap.get(r["user_id"], 0), r["furthest_step"])
        finally:
            q.stop()
        assert snap == batch_reference(events), f"divergence at seed={seed}"
