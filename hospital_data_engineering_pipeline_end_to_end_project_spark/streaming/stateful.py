"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregates can't express (running
per-key accumulators, custom eviction), Structured Streaming's
arbitrary-state API hands each key's Arrow-batched micro-batch rows to
a pandas function together with that key's persisted state.  State
lives in the state store (checkpointed, partitioned by key), so the
operator scales horizontally like any keyed aggregation.

Restartability: state recovers from the checkpoint across query
restarts — but only with a sink that supports recovery (file/parquet,
Delta, foreachBatch).  The memory sink refuses checkpoint recovery;
use it for inspection only.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, tot double"


def _update_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, tot = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        tot += float(pdf["value"].sum())
    state.update((n, tot))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(tot, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user event count + value total.

    Each micro-batch emits one updated row per active user; totals
    accumulate across the stream's lifetime in keyed state."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
