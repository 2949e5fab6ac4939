"""Custom stateful streaming operator: continuous sessionization.

The reference has no streaming engine (SURVEY §2.10); its incremental
primitives are watermark+MERGE. This module is the upgrade path for
*custom* state the built-in windowed aggregates can't express: per-user
session accumulation with ``applyInPandasWithState`` — each user's open
session lives in the state store across micro-batches, emitted when the
gap timeout passes.

Output matches the batch sessionizer (queries.sessionize_events) on the
same data once all sessions close — that equivalence is the test.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP, n_events LONG"
)
STATE_SCHEMA = "start LONG, last LONG, n LONG"

GAP_SECONDS = 30 * 60


def session_fn(key, batches, state: GroupState):
    """Accumulate per-user sessions; emit each session when a newer event
    arrives past the gap (or on state timeout)."""
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(last, unit="us")],
                "n_events": [n],
            }
        )
        return

    ts_list: list[int] = []
    for pdf in batches:
        ts_list.extend(
            int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
        )  # ns -> µs
    ts_list.sort()
    if not ts_list:
        return
    out = []
    if state.exists:
        start, last, n = state.get
    else:
        start = last = ts_list[0]
        n = 0
    for t in ts_list:
        if t - last > GAP_SECONDS * 1_000_000:
            out.append((start, last, n))
            start, n = t, 0
        last = max(last, t)
        n += 1
    state.update((start, last, n))
    try:
        # arms the open-session flush in flush_timeout mode; raises (and is
        # ignored) when the query runs with NoTimeout
        state.setTimeoutDuration(GAP_SECONDS * 1000)
    except Exception:  # noqa: BLE001
        pass
    if out:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in out],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in out],
                "n_events": [n_ for _, _, n_ in out],
            }
        )


def stream_sessionize(events, flush_timeout: bool = False):
    """events (streaming DF with user_id, ts) → closed sessions stream.

    A session closes when a LATER event for the same user arrives past the
    gap. With ``flush_timeout=True`` open sessions also flush after a
    processing-time timeout (production mode; session_fn's hasTimedOut
    branch) — left off by default because a timeout-armed query never goes
    fully idle, which livelocks ``processAllAvailable()`` in tests.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_timeout
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        session_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
