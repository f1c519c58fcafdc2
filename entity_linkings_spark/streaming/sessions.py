"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` — the pattern the built-in windowed aggregations
cannot express (a session closes when NO event arrives for ``gap``, i.e. the
window end depends on the data, not the clock grid).

State model (per user_id group):
  * state = (session_start_ms, last_event_ms, n_events) of the OPEN session;
  * each micro-batch folds its events (sorted by event time) into the state,
    EMITTING every session that closes (next event later than gap) and
    keeping the still-open one in state;
  * an event-time timeout (last_event + gap past the watermark) flushes the
    open session when the stream goes quiet for that user.

Scale notes: state is O(1) per active user (three longs), partitioned by the
group key — exactly the bounded-state shape that survives 10^12-event
streams; late events beyond the watermark are dropped by the engine before
the function runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id string, session_start_ms long, session_end_ms long, n_events long"
)
_STATE_SCHEMA = "start_ms long, last_ms long, n long"


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_ms: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id], "session_start_ms": [start],
             "session_end_ms": [last], "n_events": [n]}
        )
        return

    ts = sorted(
        int(t) for pdf in pdfs for t in (pdf["tms"] if "tms" in pdf else [])
    )
    if not ts:
        return
    if state.exists:
        start, last, n = state.get
    else:
        start, last, n = ts[0], ts[0], 0
    closed = {"user_id": [], "session_start_ms": [], "session_end_ms": [], "n_events": []}
    for t in ts:
        if n > 0 and t - last > gap_ms:
            closed["user_id"].append(user_id)
            closed["session_start_ms"].append(start)
            closed["session_end_ms"].append(last)
            closed["n_events"].append(n)
            start, n = t, 0
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    # flush the open session once the watermark passes last_event + gap
    state.setTimeoutTimestamp(last + gap_ms)
    if closed["user_id"]:
        yield pd.DataFrame(closed)


def sessionize_stream(
    events: DataFrame,
    gap_ms: int = 1_800_000,
    watermark: str = "2 hours",
) -> DataFrame:
    """(user_id, session_start_ms, session_end_ms, n_events) per CLOSED
    session over a streaming (user_id, ts) event table. Event-time gap
    semantics with bounded per-user state; sessions also close via event-time
    timeout when a user goes quiet."""
    import pyspark.sql.functions as F

    keyed = (
        events.withWatermark("ts", watermark)
        .select(
            "user_id",
            F.col("ts"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("tms"),
        )
        .groupBy("user_id")
    )
    return keyed.applyInPandasWithState(
        lambda key, pdfs, state: _sessionize_group(key, pdfs, state, gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
