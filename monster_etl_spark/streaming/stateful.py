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
        # step-2/3 event times seen but currently INVALID (t <= upstream
        # completion): kept so a late-but-earlier upstream event can
        # re-validate them exactly as the batch funnel would
        T.StructField("c2", T.ArrayType(T.LongType())),
        T.StructField("c3", T.ArrayType(T.LongType())),
    ]
)

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("furthest_step", T.LongType()),
    ]
)


_FUNNEL_MAX_CANDIDATES = 1024


def streaming_funnel(
    events: DataFrame,
    steps: tuple[str, str, str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming counterpart of the batch ordered funnel (first-touch,
    strictly-after semantics — queries/events_queries.py::q_funnel): a
    per-user state machine over ``applyInPandasWithState`` tracks the
    earliest completion time of each step, where step k counts only
    strictly after the user's step k-1 time. Emits (user_id,
    furthest_step) per batch that advanced the user.

    Cross-batch exactness: step k's completion time is non-increasing (a
    late event can only move it EARLIER), so a late-but-earlier step-1
    event can retroactively make a step-2 event from a PRIOR batch valid.
    State therefore keeps, per downstream step, the event times seen but
    currently invalid (``t <= upstream completion`` — exactly the ones a
    lowered upstream time could validate), and recomputes each completion
    as the min valid candidate every batch. This reproduces the batch
    funnel on any micro-batch slicing of the same events (pinned by
    ``test_funnel_late_earlier_upstream_across_batches``). The candidate
    lists are capped at ``_FUNNEL_MAX_CANDIDATES`` (oldest-kept ordering
    by time); past the cap the result degrades to the r2 approximation —
    per-user funnels are short in practice, and the cap bounds state.

    State bound: per user, 3 longs + the capped candidate lists.
    ``ttl_ms`` arms a processing-time timeout that drops a user's state
    after that much inactivity (a later event restarts their funnel) —
    the knob that keeps total state O(active users) on an unbounded
    deployment. Default None preserves lifetime semantics.
    """
    s1_name, s2_name, s3_name = steps
    cap = _FUNNEL_MAX_CANDIDATES

    def _update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        s1, s2, s3, c2, c3 = state.get if state.exists else (0, 0, 0, [], [])
        c2, c3 = list(c2 or []), list(c3 or [])
        before = (s1, s2, s3)
        new1, new2, new3 = [], [], []
        for pdf in pdfs:
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                t = int(ts.value // 1000)  # ns -> us
                if et == s1_name:
                    new1.append(t)
                elif et == s2_name:
                    new2.append(t)
                elif et == s3_name:
                    new3.append(t)

        if new1:
            m = min(new1)
            if s1 == 0 or m < s1:
                s1 = m

        def resolve(best, candidates, fresh, upstream):
            # pool = stored invalid candidates + current best + new events;
            # completion = min pool time strictly after upstream; keep the
            # still-invalid remainder (t < new completion) as candidates
            pool = candidates + fresh + ([best] if best else [])
            valid = [t for t in pool if upstream != 0 and t > upstream]
            best = min(valid) if valid else 0
            rest = sorted({t for t in pool if best == 0 or t < best})[:cap]
            return best, rest

        s2, c2 = resolve(s2, c2, new2, s1)
        s3, c3 = resolve(s3, c3, new3, s2)

        state.update((s1, s2, s3, c2, c3))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if (s1, s2, s3) != before:
            furthest = 3 if s3 else (2 if s2 else 1)
            yield pd.DataFrame({"user_id": [key[0]], "furthest_step": [furthest]})

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="ProcessingTimeTimeout" if ttl_ms is not None else "NoTimeout",
    )
