"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact or fact-bigdim join is the
shuffle of the large side. Broadcasting handles small dims
(``operators.scd.scd_point_in_time_join``); bucketing handles the rest:
write both tables hash-partitioned into the same number of buckets on
the join key, and Spark's bucketed scan gives every join on that key a
shuffle-free plan forever after — the shuffle is paid ONCE at write
time, amortized over every subsequent query.

The reference has no analogue (its fact lives in SQL Server,
``CreateModel.sql:151``); this is the lakehouse replacement for its
clustered columnstore + FK indexes.

Plan property (pinned by tests/test_bucketing.py): joining two tables
bucketed identically on the join key produces NO Exchange operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    on ``bucket_col``.

    ``sortBy`` keeps each bucket file internally ordered so sort-merge
    joins can skip their sort phase when buckets are single-file
    (1 file/bucket is guaranteed on a real warehouse write via a
    pre-repartition; local test writes may produce several).
    """
    writer = (
        df.repartition(num_buckets, bucket_col)  # 1 file per bucket
        .write.format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .option("path", path)
        .mode("overwrite")
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key. With
    matching bucket specs Catalyst plans a sort-merge join whose both
    sides read pre-partitioned buckets — zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)
