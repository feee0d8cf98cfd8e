"""Custom stateful streaming operator via ``applyInPandasWithState``.

Beyond the built-in windowed aggregations: arbitrary per-key state carried
across micro-batches (the Structured Streaming analogue of a keyed process
function). The example operator maintains per-user running totals/counts and
emits one updated row per user per batch.

State is partitioned by the grouping key and checkpointed by the engine;
at scale the state store shards with the shuffle partitions. The worker
function is a self-contained closure (no module-level references) so
executors need no package install.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RUNNING_TOTAL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user lifetime event count + value sum, updated every micro-batch.

    ``events`` must be a streaming DataFrame with (user_id, value).
    Output mode: update (one row per user per batch that saw data).
    """

    def _update(key, pdfs, state):
        # self-contained: imports inside, no enclosing-module references
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_TOTAL_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s1", T.LongType()),  # micros since epoch, 0 = not reached
        T.StructField("s2", T.LongType()),
        T.StructField("s3", T.LongType()),
    ]
)

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("furthest_step", T.LongType()),
    ]
)


def streaming_funnel(events: DataFrame, steps: tuple[str, str, str]) -> DataFrame:
    """Streaming counterpart of the batch ordered funnel (first-touch,
    strictly-after semantics — queries/events_queries.py::q_funnel): a
    per-user state machine over ``applyInPandasWithState`` tracks the
    earliest completion time of each step, where step k counts only
    strictly after the user's step k-1 time. Emits (user_id,
    furthest_step) per batch that advanced the user.

    Semantic note honored from the batch twin: step k's earliest valid
    event can only move EARLIER within what arrives, never violate order
    — each batch replays its rows in event-time order against the saved
    state, so a late-but-earlier step-1 event correctly resets nothing
    downstream that it precedes (within-batch); cross-batch late data is
    bounded by the upstream watermark exactly like the built-in windowed
    aggregations. State per user is three longs — O(users) state, the
    same scale contract as any keyed stream aggregate.
    """
    s1_name, s2_name, s3_name = steps

    def _update(key, pdfs, state):
        import pandas as pd

        s1, s2, s3 = state.get if state.exists else (0, 0, 0)
        before = (s1, s2, s3)
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["ts", "event_type"]])
        if rows:
            allr = pd.concat(rows).sort_values("ts")
            for ts, et in zip(allr["ts"], allr["event_type"]):
                t = int(ts.value // 1000)  # ns -> us
                if et == s1_name and (s1 == 0 or t < s1):
                    s1 = t
                elif et == s2_name and s1 != 0 and t > s1 and (s2 == 0 or t < s2):
                    s2 = t
                elif et == s3_name and s2 != 0 and t > s2 and (s3 == 0 or t < s3):
                    s3 = t
        state.update((s1, s2, s3))
        if (s1, s2, s3) != before:
            furthest = 3 if s3 else (2 if s2 else 1)
            yield pd.DataFrame({"user_id": [key[0]], "furthest_step": [furthest]})

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
