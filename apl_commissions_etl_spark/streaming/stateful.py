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
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
