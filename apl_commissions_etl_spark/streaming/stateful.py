"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10 new surface — the escape hatch for semantics the
built-in windowed aggs can't express).

``running_user_totals``: per-user lifetime counters (event count +
exact value total) emitted on every update — the streaming analogue of
the reference's resumable run-state accumulation. State lives in the
state store (checkpointed, restored on restart), Arrow-batched in and
out — no row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, cents long"


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents: float sums would drift with batch order
        cents += int(round(pdf["value"].fillna(0.0).mul(100).round().sum()))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: one updated row per user per micro-batch with
    lifetime totals (value in integer cents, order-independent)."""
    from ..shipping import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events long"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"

#: session gap (seconds of event time) and the extra slack before a
#: processing-time timeout finalizes an idle session
SESSION_GAP_S = 30 * 60


def _session_update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Timeout-driven sessionization: one open session per user in the
    state store; an event beyond the gap CLOSES the previous session
    (emitting it) and opens a new one; a processing-time timeout
    flushes sessions that stopped receiving events entirely.

    This is the semantics ``F.session_window`` cannot express when the
    close action must emit the FINISHED session exactly once (the
    built-in emits evolving windows per batch in update mode)."""
    out = []
    if state.hasTimedOut:
        start, last, n = state.get
        out.append((key[0], start, last, n))
        state.remove()
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end", "n_events"],
        )
        return

    start, last, n = state.get if state.exists else (None, None, 0)
    rows = []
    for pdf in pdfs:
        for ts in pdf["ts_s"]:
            rows.append(int(ts))
    for ts in sorted(rows):
        if start is None:
            start, last, n = ts, ts, 1
        elif ts - last > SESSION_GAP_S:
            out.append((key[0], start, last, n))
            start, last, n = ts, ts, 1
        else:
            last, n = ts, n + 1
    state.update((start, last, n))
    state.setTimeoutDuration(1000)
    yield pd.DataFrame(
        out, columns=["user_id", "session_start", "session_end", "n_events"]
    )


def closed_sessions(events: DataFrame) -> DataFrame:
    """Streaming: emit each CLOSED 30-min-gap session exactly once
    (events must carry an integer-seconds ``ts_s`` column)."""
    from ..shipping import ensure_package_on_executors

    ensure_package_on_executors(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _session_update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
