"""Interval-overlap range join via bucket-explode + equi-join.

A naive interval-overlap join (``a.start <= b.end AND b.start <=
a.end``) has no equality predicate, so Spark can only plan it as a
broadcast-nested-loop or cartesian product — O(|A|*|B|) and
undistributable when both sides are large. The standard scale-out
algorithm (genomic interval joins; Databricks' range-join
optimization) converts it to an equi-join:

1. tag every interval with the coarse time buckets it spans and
   explode (an interval spanning k buckets becomes k rows),
2. hash equi-join on the bucket — only intervals sharing a bucket
   ever meet, and the join is shuffle-partitionable by bucket,
3. post-filter the exact overlap predicate,
4. emit each pair exactly once at bucket ``max(a_start_bucket,
   b_start_bucket)`` — for overlapping intervals that bucket is
   guaranteed to be shared (max of starts <= min of ends), so no
   pair is lost and none duplicates.

Bucket width trades shuffle size (small buckets -> more exploded
rows) against join selectivity (large buckets -> more false pairs
for the post-filter); set it near the typical interval length.

No reference analogue (the reference's only interval logic is the
SCD point-in-time lookup, ``create_update_liqour_sales_fact_table.py:19-32``,
which is equi-keyed per natural key and broadcastable); this is the
big-x-big generalization.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_BUCKET = "__bucket"


def _bucket_of(col: str, bucket_seconds: int) -> Column:
    # cast("timestamp") first: no-op for TIMESTAMP_LTZ, and the legal
    # session-tz interpretation for TIMESTAMP_NTZ (unix_timestamp rejects
    # NTZ directly); both join sides bucket through the same expression,
    # so bucket alignment holds whatever the source type
    return (F.unix_timestamp(F.col(col).cast("timestamp")) / bucket_seconds).cast("long")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    *,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join every row of ``a`` with every row of ``b`` whose closed
    interval ``[b_start, b_end]`` overlaps ``[a_start, a_end]``.
    Column names must be disjoint between the two sides."""
    ab = _bucket_of(a_start, bucket_seconds)
    bb = _bucket_of(b_start, bucket_seconds)
    a_x = a.withColumn(
        _BUCKET, F.explode(F.sequence(ab, _bucket_of(a_end, bucket_seconds)))
    )
    b_x = b.withColumn(
        _BUCKET, F.explode(F.sequence(bb, _bucket_of(b_end, bucket_seconds)))
    )
    overlap = (F.col(a_start) <= F.col(b_end)) & (F.col(b_start) <= F.col(a_end))
    return (
        a_x.join(b_x, _BUCKET)
        .where(overlap)
        .where(F.col(_BUCKET) == F.greatest(ab, bb))
        .drop(_BUCKET)
    )
