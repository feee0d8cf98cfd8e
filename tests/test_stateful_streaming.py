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
