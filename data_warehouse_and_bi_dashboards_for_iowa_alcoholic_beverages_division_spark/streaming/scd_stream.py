"""Streaming SCD2 dimension maintenance.

The reference runs its SCD merge as a scheduled batch (Airflow task →
`update_store_dim.py` → `scd.py:230-265`, applied by driver-side
row-at-a-time UPDATEs at `scd.py:194-217`). The Spark-native upgrade is
Structured Streaming over the staging directory: each micro-batch of
raw change records is folded into the parquet dimension with the same
`scd_update_and_insert` merge, inside `foreachBatch` — exactly-once
per batch via the streaming checkpoint, no driver funnel, and the
`Trigger.AvailableNow` drain doubles as the reference's incremental
batch when run on a schedule.

Dimensions are small relative to facts (§ SURVEY.md 1.1), so the
read-merge-overwrite of the dimension table per micro-batch is cheap at
any scale; the fact-side stream never rewrites history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..operators.scd import apply_scd_changes, create_scd_from_input, scd_update_and_insert


def _read_dim(spark: SparkSession, dim_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(dim_path)
    except Exception:  # first batch: dimension does not exist yet
        return None


def scd_upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    dim_path: str,
    natural_key: str,
    date_col: str,
    attribute_cols: Sequence[str],
) -> None:
    """Fold one batch of raw change records into the parquet dimension
    (create on first batch, incremental merge afterwards)."""
    old = _read_dim(spark, dim_path)
    if old is None:
        merged = create_scd_from_input(batch_df, attribute_cols, date_col, natural_key)
    else:
        to_update, to_insert = scd_update_and_insert(
            old, batch_df, natural_key, date_col, attribute_cols
        )
        merged = apply_scd_changes(old, to_update, to_insert, natural_key)
    # materialize off the source files before overwriting them
    # (parquet cannot overwrite a path its own plan is still reading)
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(dim_path)


def scd_stream_upsert(
    spark: SparkSession,
    staging_dir: str,
    dim_path: str,
    checkpoint_dir: str,
    natural_key: str,
    date_col: str,
    attribute_cols: Sequence[str],
    schema: StructType,
) -> None:
    """Drain every unprocessed file under ``staging_dir`` into the SCD2
    dimension at ``dim_path``, one merge per micro-batch. Re-running
    with the same checkpoint processes only newly arrived files — the
    streaming equivalent of the reference's watermark-gated update DAG
    branch (`dags/main_pipeline.py:92-151`)."""
    stream = spark.readStream.schema(schema).parquet(staging_dir)

    def _apply(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        scd_upsert_batch(spark, batch_df, dim_path, natural_key, date_col, attribute_cols)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
