"""Write-path data layout: range-clustered parquet for stat-based skipping.

The reference writes unsorted append-mode parquet (`ingest_utils.py:72-76`)
and relies on SQL Server's columnstore for data locality
(`CreateModel.sql:151`). In a parquet lakehouse the equivalent lever is
the *layout of the files themselves*: if each file owns a disjoint range
of the clustering key, every footer's min/max statistics prune whole
files (and row groups) for range predicates — at 100 TB the difference
between scanning terabytes and scanning megabytes for a date-bounded
query.

``repartitionByRange`` (sampled range partitioner; equal keys never
split across partitions) + ``sortWithinPartitions`` gives monotone,
non-overlapping per-file ranges with exactly one shuffle, and keeps the
sort whole-stage-codegen'd. This composes with the date-partitioned
fact layout (partition pruning first, then file/row-group skipping
within each date partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet with files range-clustered on
    ``cluster_cols``: each output file owns a disjoint key range, so
    parquet footer min/max statistics prune files for range predicates.
    """
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )
