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


# ---------------------------------------------------------------------
# Stateful touch attribution — the streaming twin of the batch q193
# window (plans/queries.py): per-user first/last non-purchase touch
# carried as keyed state, each purchase emitted with the touches that
# were current at its position in (ts, event_id) order. State is two
# strings per user — bounded, checkpointed, horizontally partitioned
# by user exactly like the batch window's hash partitioning.

ATTR_OUTPUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, value DOUBLE,"
    " first_touch STRING, last_touch STRING"
)
# '' encodes "no touch yet" (state columns are nullable but a sentinel
# keeps the update function total); emitted rows translate '' -> NULL
ATTR_STATE_SCHEMA = "first_touch STRING, last_touch STRING"


def _update_touches(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (user_id,) = key
    first, last = state.get if state.exists else ("", "")
    out_event, out_value, out_first, out_last = [], [], [], []
    # a group's micro-batch rows arrive as MULTIPLE Arrow chunks in
    # arbitrary order (spark.sql.execution.arrow.maxRecordsPerBatch
    # bounds each chunk) — materialize and sort the whole micro-batch
    # once, or the order-sensitive state machine misattributes any
    # user whose rows straddle a chunk boundary; cross-batch order
    # stays the source's responsibility (staged chronological files /
    # kafka per-key ordering), same as any event-time state machine
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        whole = pd.concat(chunks).sort_values(["ts", "event_id"])
        for et, eid, val in zip(whole["event_type"], whole["event_id"], whole["value"]):
            if et == "purchase":
                out_event.append(int(eid))
                out_value.append(float(val))
                out_first.append(first or None)
                out_last.append(last or None)
            else:
                last = et
                first = first or et
    state.update((first, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_event),
            "event_id": out_event,
            "value": out_value,
            "first_touch": out_first,
            "last_touch": out_last,
        }
    )


def touch_attribution_stream(events: DataFrame) -> DataFrame:
    """Streaming first/last-touch attribution: every purchase row is
    emitted exactly once, tagged with the first and the most recent
    preceding non-purchase event of the same user — the incremental
    form of q193's one-pass window, for when attribution must be
    current within a micro-batch rather than recomputed per day."""
    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_touches,
            outputStructType=ATTR_OUTPUT_SCHEMA,
            stateStructType=ATTR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
