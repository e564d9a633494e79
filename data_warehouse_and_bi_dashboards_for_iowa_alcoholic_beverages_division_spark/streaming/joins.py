"""Stream-stream joins and streaming deduplication.

Beyond-reference (SURVEY §2.9: the reference is batch-only). Two
stateful streaming operators a 100 TB event pipeline needs:

- **Watermarked stream-stream interval join**: click attributed to the
  view that preceded it within an attribution horizon. Both sides
  carry watermarks and the join predicate carries a time bound, so
  Spark can expire join state — without both, state grows forever.
- **Streaming exact dedup**: ``dropDuplicatesWithinWatermark`` keeps
  one row per key among duplicates arriving within the watermark and
  ages the key state out afterwards — the streaming twin of the batch
  ``q30_dedup_exact`` operator (at-least-once sources make this the
  first stage of every ingestion DAG).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _as_event_time(events: DataFrame, col: str = "ts") -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); upstream batch reads
    canonicalize to TIMESTAMP_NTZ. Cast defensively so any caller's
    stream works — but the NTZ→LTZ cast is wall-clock-exact only under
    a UTC session, so refuse to shift watermark/window boundaries
    silently when a caller brings a non-UTC session."""
    if dict(events.dtypes).get(col) == "timestamp_ntz":
        tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz != "UTC":
            raise ValueError(
                f"event-time cast requires spark.sql.session.timeZone='UTC' "
                f"(got {tz!r}): a non-UTC session would shift every "
                f"watermark and window boundary by the zone offset. Use "
                f"session.get_spark() or set the conf before streaming."
            )
        events = events.withColumn(col, F.col(col).cast("timestamp"))
    return events


def attribute_clicks_to_views(
    events: DataFrame,
    *,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream join: each click paired with every view by
    the same user in the preceding ``horizon``.

    The two inputs are filtered branches of one source stream (Spark
    plans this as a genuine stream-stream join). Inner joins emit as
    soon as a match lands; the watermark + time-bound predicate let
    the state store evict view rows older than
    ``watermark + horizon`` — bounded state at any scale.
    """
    events = _as_event_time(events)
    views = (
        events.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (views.v_user_id == clicks.c_user_id)
        & (clicks.click_ts > views.view_ts)
        & (clicks.click_ts <= views.view_ts + F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(views, cond, "inner").select(
        F.col("c_user_id").alias("user_id"), "click_id", "view_id", "click_ts", "view_ts"
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` (default: event_id).

    State per key lives only until the watermark passes its event
    time, so the operator runs indefinitely with bounded memory —
    the property a naive ``dropDuplicates`` on a stream lacks (its
    state never expires).
    """
    return _as_event_time(events).withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
