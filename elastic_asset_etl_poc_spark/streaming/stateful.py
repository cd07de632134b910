"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (Arrow-batched per-group state).

The DataFrame/SQL surface covers the reference's entire operator set
(SURVEY.md §2.10); this module exists for the one class of semantics the
builtin stateful ops can't express — arbitrary per-key running state
across micro-batches.  Pattern: group by key, feed Arrow batches + a
GroupState handle to a pandas function, emit update rows.

Scale posture: state is one small tuple per user (last_ts, counters) in
the state store; batches arrive Arrow-vectorized; no per-row Python round
trips outside the grouped batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MINUTES = 30

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
    ]
)

#: (last_event_ts_us, n_events, n_sessions)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
    ]
)


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_ts_us, n_events, n_sessions = state.get
    else:
        last_ts_us, n_events, n_sessions = None, 0, 0

    gap_us = SESSION_GAP_MINUTES * 60 * 1_000_000
    for pdf in pdfs:
        # normalize to µs explicitly — Arrow may deliver datetime64[ns],
        # and a bare int64 cast would inflate every gap 1000×
        ts_us = (
            pdf["ts"].astype("datetime64[ns]").astype("int64").sort_values().to_numpy()
            // 1000
        )
        for t in ts_us:
            if last_ts_us is None or t - last_ts_us > gap_us:
                n_sessions += 1
            last_ts_us = int(t)
            n_events += 1

    state.update((last_ts_us, n_events, n_sessions))
    yield pd.DataFrame(
        [(user_id, n_events, n_sessions)],
        columns=["user_id", "n_events", "n_sessions"],
    )


def stream_sessionize(events: DataFrame) -> DataFrame:
    """Per-user running session counts over a streaming events frame.

    Input needs columns ``user_id`` and timestamp ``ts``; emits one update
    row per (user, micro-batch) with cumulative counters.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
