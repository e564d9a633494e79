"""Custom stateful streaming operator: per-user running counters via
``applyInPandasWithState``.

Demonstrates the engine's path for operators Spark's built-ins can't
express (custom session logic, decaying counters, CEP-ish patterns):
keyed state + Arrow-batched pandas per group. State is a fixed-width
tuple per key — bounded memory, checkpointed by the engine, scales
horizontally with the number of keys.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _update_user_totals(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user lifetime counters: each micro-batch emits the
    refreshed (count, total) for users seen in that batch. The same
    call works on any keyed stream; swap the update function for
    arbitrary custom state machines."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
