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
