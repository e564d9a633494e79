"""Structured Streaming over the events table.

Beyond-reference (the reference is batch-only): the same event
aggregations as the batch queries, expressed as a streaming plan with
watermarked tumbling windows. ``Trigger.AvailableNow`` drains a staging
directory exactly once — the streaming equivalent of the reference's
watermark-gated incremental batch, with checkpointed exactly-once
progress instead of a hand-rolled high-watermark.

The batch query ``q41_events_hourly`` in plans/queries.py is the
oracle-checked twin of ``hourly_counts``; the streaming path is
asserted equal to the batch result in tests (same input ⇒ same rows).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import normalize_events_ts
from .joins import _as_event_time


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events staging dir. At scale this is
    the same plan pointed at a Kafka source — everything downstream is
    source-agnostic.

    The file source needs an explicit schema; we take it from the
    file's own footer (one metadata read, no data scan) instead of
    hard-coding it — the driver has regenerated events.parquet with a
    different physical ts encoding between rounds, and a pinned schema
    is exactly what broke last time. ``normalize_events_ts`` then maps
    whatever arrived onto the canonical TIMESTAMP_NTZ ``ts``.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # watermarks demand TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    # NTZ), so the stream carries LTZ; the session tz is pinned UTC, so
    # the NTZ→LTZ cast preserves wall-clock exactly
    return normalize_events_ts(raw).withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event type: count + exact-decimal
    value sum. The watermark bounds state: late rows beyond it are
    dropped and their windows finalized."""
    return (
        _as_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, table_name: str, output_mode: str = "complete"
) -> None:
    """Drain all available input exactly once into an in-memory sink
    (tests) — the pattern for incremental production runs is identical
    with a parquet/Delta sink + the same checkpoint dir.

    Default ``complete`` mode: in ``append`` a watermarked aggregation
    only emits windows older than the watermark, so the final (still
    open) windows of a drained directory would be withheld."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_with_dim(stream_df: DataFrame, dim_df: DataFrame, on: str) -> DataFrame:
    """Stream-static dimension enrichment: join a stream against a
    batch dimension table. Spark plans the static side as a broadcast
    re-resolved per micro-batch — no state store, no watermark needed
    (unlike stream-stream joins), and dimension updates between
    batches are picked up automatically. This is the streaming twin of
    the warehouse star-join lookups (reference's dim joins,
    ``create_update_liqour_sales_fact_table.py:140-163``)."""
    return stream_df.join(F.broadcast(dim_df), on, "left")


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization: merging session windows per user with
    a late-data watermark. In append mode only sessions whose end is
    at or before the final watermark (max event time, truncated to
    milliseconds, minus the delay — emission INCLUDES equality) are
    emitted: exactly the sessions that can no longer grow. State per
    in-flight session is one (user, interval, count) row."""
    return (
        _as_event_time(events).withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def windowed_distinct_sketch(
    events: DataFrame, k: int = 64, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-window KMV distinct-user sketch + estimate: the streaming
    twin of the q161 batch sketch (operators/sketches.py). Each
    tumbling window carries its k smallest distinct user-id hashes, so
    downstream consumers can merge windows (k-min of concatenated
    sketches — associative) or union days into a distinct-users-per-
    week estimate without reprocessing, exactly the partial-sketch
    contract of the batch family.

    State honesty: the aggregation buffer is ``collect_set`` over the
    window's distinct hashes — O(distinct-per-window), not O(k);
    windows bound it (an hour of users, not the corpus), and the
    emitted row is k values. A strictly-O(k) buffer needs a custom
    JVM UDAF or ``applyInPandasWithState`` (demonstrated in
    scd_stream.py) — this is the declarative form.

    ``exact_distinct`` rides along (the collect_set size is exact) so
    tests pin the estimator error per window.
    """
    from ..operators.sketches import TWO_60, kmv_hash

    sk = F.slice(F.array_sort(F.col("hs")), 1, k)
    n = F.least(F.size("hs"), F.lit(k))
    hk = F.element_at(sk, n)
    est = (n.cast("double") - F.lit(1.0)) / (hk.cast("double") / F.lit(TWO_60))
    return (
        _as_event_time(events)
        .withWatermark("ts", watermark)
        .withColumn("hv", kmv_hash(F.col("user_id")))
        .groupBy(F.window("ts", window).alias("win"))
        .agg(F.collect_set("hv").alias("hs"))
        .select(
            F.col("win.start").alias("hour_start"),
            sk.alias("sketch"),
            F.size("hs").alias("exact_distinct"),
            est.alias("kmv_estimate"),
        )
    )


def windowed_mix_drift(
    events: DataFrame,
    ref_probs: dict[str, float],
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-window KL divergence of the event-type mix against a
    reference distribution (a batch snapshot's probabilities) — the
    streaming twin of q172's corpus-drift tripwire: an upstream change
    (a scraper breaks, a producer floods one type) raises the KL of
    every window it touches, live.

    Chained aggregations are illegal in streaming append mode, so the
    per-type counts come from ONE windowed aggregation with a
    conditional sum per (known, fixed) reference type, and the KL is a
    pure projection over those columns — smoothed add-1 terms folded
    in sorted type order at expression-construction time, so batch and
    stream (and any engine re-deriving it) agree bit-for-bit.
    """
    types = sorted(ref_probs)
    agg_cols = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{i}")
        for i, t in enumerate(types)
    ]
    out = (
        _as_event_time(events)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"))
        .agg(F.count("*").alias("n_total"), *agg_cols)
    )
    v = float(len(types))
    kl = None
    for i, t in enumerate(types):
        p = (F.col(f"n_{i}").cast("double") + F.lit(1.0)) / (
            F.col("n_total").cast("double") + F.lit(v)
        )
        term = p * F.log(p / F.lit(float(ref_probs[t])))
        kl = term if kl is None else kl + term
    return out.select(
        F.col("win.start").alias("hour_start"),
        F.col("n_total"),
        kl.alias("kl_vs_reference"),
    )


def event_mix_reference(events: DataFrame) -> dict[str, float]:
    """Batch helper: the smoothed event-type distribution of a
    snapshot, as the reference for ``windowed_mix_drift``. Floored to
    6dp so the reference literals are reproducible anywhere."""
    import math

    rows = events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    total = sum(r["n"] for r in rows)
    v = len(rows)
    return {
        r["event_type"]: math.floor(
            (r["n"] + 1.0) / (total + float(v)) * 1000000 + 0.5
        )
        / 1000000.0
        for r in rows
    }
