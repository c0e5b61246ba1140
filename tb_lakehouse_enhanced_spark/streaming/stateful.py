"""Custom stateful streaming operator: gap-based session windows.

The batch formulation lives in plans/queries.py (``sessionize``, two
window functions). This is the streaming twin: per-user session state
maintained with ``applyInPandasWithState`` — the extension point for
operators Spark's built-in streaming aggregations can't express
(arbitrary per-key state machines).

State per user = the open session (start, end, count). A micro-batch's
events merge into it in event-time order; every gap > ``gap_minutes``
closes a session, which is emitted downstream (append mode). The still-
open session stays in state; an event-time timeout flushes it once the
watermark passes end + gap, bounding state size.

Scale: state is shuffled by user_id (same key partitioning as the batch
window), one tiny row per active user; Arrow batches amortize the
Python crossing exactly like the similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                 "session_end timestamp, n_events int")
STATE_SCHEMA = "start long, end long, n int"  # epoch-us for Arrow stability


def sessionize_stateful(events: DataFrame, gap_minutes: int = 30,
                        watermark: str = "2 hours") -> DataFrame:
    """events(ts, user_id, ...) -> closed sessions, streaming."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user_id],
                                "session_start": [pd.Timestamp(start, unit="us")],
                                "session_end": [pd.Timestamp(end, unit="us")],
                                "n_events": [n]})
            return

        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        ts_us = (ts.astype("int64") // 1000).tolist()  # ns -> epoch-us

        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = None, None, 0

        closed = []
        for t in ts_us:
            if start is None:
                start, end, n = t, t, 1
            elif t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = t, n + 1
        state.update((start, end, n))
        state.setTimeoutTimestamp((end + gap_us) // 1000)  # ms
        if closed:
            yield pd.DataFrame({
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed]})

    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(fn, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.EventTimeTimeout))
