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


def zorder_value_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` bits of two
    non-negative integer columns into one Z-order (Morton) value.

    Range-clustering on the 1-D Z-value bounds EVERY interleaved
    dimension per file, so footer min/max statistics skip files for
    predicates on either column (or both) — the multi-dimensional
    extension of ``clustered_write``, same idea as Delta/Iceberg
    Z-ORDER table maintenance. The expression is plain integer
    arithmetic, valid verbatim on Spark and DuckDB (used by the
    q119 oracle pair); 2*bits must stay < 63 so ANSI mode cannot
    overflow.
    """
    if not 0 < bits <= 31:
        raise ValueError("bits must be in 1..31")
    # operands are widened to BIGINT so shifts up to 2*bits+1 stay in
    # 64-bit arithmetic even for 32-bit input columns (int shifts wrap
    # on Spark and error on DuckDB from bit 31 up)
    a, b = f"CAST({col_a} AS BIGINT)", f"CAST({col_b} AS BIGINT)"
    terms = [
        f"((({a} >> {i}) & 1) << {2 * i + 1}) + ((({b} >> {i}) & 1) << {2 * i})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet files clustered on the Z-order curve of two
    columns: each file owns a compact rectangle of the key space, so
    range predicates on either dimension prune files.

    Both columns are min-max scaled to the same ``bits``-bit width
    before interleaving: interleaving raw values lets the wider-domain
    column own the curve's top bits, so file boundaries degenerate
    into 1-D slabs of that column and the other dimension never
    splits. (Delta/Iceberg Z-ORDER likewise interleaves per-column
    range-bucket ids, not raw values.) The min/max pass is one tiny
    aggregate job — the same kind of pre-pass the range partitioner's
    sampling already does."""
    from pyspark.sql import functions as F

    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    top = (1 << bits) - 1

    def scaled(c: str, lo, hi) -> str:
        if lo is None or hi is None or hi == lo:
            return "CAST(0 AS BIGINT)"
        return f"CAST((CAST({c} AS DOUBLE) - ({lo})) * {top} / (({hi}) - ({lo})) AS BIGINT)"

    zv = F.expr(
        zorder_value_sql(scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b), bits)
    ).alias("__zval")
    (
        df.withColumn("__zval", zv)
        .repartitionByRange(n, "__zval")
        .sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode(mode)
        .parquet(path)
    )


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write (one directory per
    partition value). Queries filtering on the partition columns scan
    only the matching directories — ``PartitionFilters`` in the plan,
    zero I/O for pruned partitions. This is the coarse layer above
    file-level stat skipping: the reference's incremental loads
    (watermark ``WHERE date > X``, ``dags/main_pipeline.py:92-151``)
    become metadata-only partition selections on a date-partitioned
    fact."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)
