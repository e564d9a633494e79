"""Sequence packing: concat-and-chunk documents into fixed token windows.

The standard pre-training layout: within each stream (here: language),
documents are concatenated in a deterministic order and the token stream
is chunked into fixed-size context windows ("packs"). Each document's
pack assignment is a pure function of the running token offset, so the
layout is reproducible on any cluster shape.

Spark-first design: the running offset is a single window cumulative sum
over ``(stream ORDER BY order_col)`` — one shuffle on the stream key,
no driver-side loop, no UDF. At 100 TB the streams partition the work;
a skewed stream can be pre-split by salting the stream key per epoch.

Reference scope: the reference repo has no packing operator (it is a BI
warehouse); this belongs to the beyond-reference training-data surface
required alongside SURVEY.md §2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_offsets(
    df: DataFrame,
    *,
    tokens_col: str,
    order_col: str,
    stream_col: str,
    budget: int,
) -> DataFrame:
    """Annotate each row with its start offset in the concatenated
    per-stream token stream, the pack (chunk) its first token lands in,
    and the pack its last token lands in.

    ``pack_id != end_pack`` means the document spans a chunk boundary
    (it will be split across two or more context windows).
    """
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(F.col(tokens_col).cast("long")).over(w), F.lit(0).cast("long"))
    return (
        df.withColumn("start_offset", start)
        .withColumn("pack_id", F.expr(f"start_offset DIV {int(budget)}"))
        .withColumn(
            "end_pack",
            F.expr(f"(start_offset + CAST({tokens_col} AS BIGINT) - 1) DIV {int(budget)}"),
        )
    )
