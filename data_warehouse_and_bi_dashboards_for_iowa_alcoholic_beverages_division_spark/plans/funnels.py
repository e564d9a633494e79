"""Single-partition-window anti-pattern demonstrations ("funnels").

Each function here is the GLOBAL-NTILE form of a banding analytic that
the registry serves through a window-free, distributed device:

=========================  ===========================  ==============
funnel (this module)       registered scale-safe query  device
=========================  ===========================  ==============
balance_deciles_funnel     q204_decile_thresholds       exact-threshold
                                                        histogram
                                                        banding
                                                        (operators/
                                                        quantiles.py)
length_bucketed_batches_   q207_batch_padding_          rank-interval
funnel                     distributed                  arithmetic over
                                                        the token-count
                                                        histogram
rfm_segments_funnel        q206_rfm_distributed         per-measure
                                                        threshold
                                                        refinement
=========================  ===========================  ==============

Why they are NOT registered queries: a global ``ntile`` is a total
order, so Spark honestly plans ONE unpartitioned WindowExec — every
input row through a single task. That is acceptable pedagogy and
correct at test scale, but a user who reaches for the convenient name
at 100 TB hits the one-task funnel; rounds 7-9 kept these registered
with an allowlist note, and the round-9 review asked for the default
to flip. The registry now carries only the scale-safe devices, and the
ntile forms live here as documented contrast twins, pinned by
``tests/test_funnels.py``:

- each funnel's physical plan really does contain the unpartitioned
  window (the anti-pattern is demonstrated, not described);
- ``length_bucketed_batches_funnel`` returns EXACTLY
  ``q207_batch_padding_distributed``'s rows (the two shared one oracle
  while both were registered — per-bucket padding stats are
  tiebreak-invariant);
- the decile/RFM funnels cover the identical population (band counts
  sum to the table cardinality; full band grid present). Per-band
  counts are NOT asserted equal to the distributed twins': ntile
  splits boundary tie-groups by row rank while exact-threshold banding
  sends whole tie-groups to the lower band — the documented semantic
  difference between the two contracts.

Reference for the banding semantics: the dashboard drill-down surface
(reference README.md:40-61) defines top-N/banded aggregates; the
reference itself never needs a global ntile.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..functions.rounding import floor_round6
from ..operators import text
from ..sources.tables import load_table


def balance_deciles_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) decile banding of customer balances — the
    single-partition-window form of q204_decile_thresholds."""
    w = Window.orderBy("bal", "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_acctbal").cast("decimal(12,2)").alias("bal"), "c_custkey")
        .withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_custs"),
            F.min("bal").alias("lo"),
            F.max("bal").alias("hi"),
        )
    )


def length_bucketed_batches_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(8) length buckets + fixed 32-doc batches + per-bucket
    padding-waste stats — the single-partition-window form of
    q207_batch_padding_distributed (identical output: the per-bucket
    stats are tiebreak-invariant)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", text.token_count_expr("text").alias("ntok"))
    wb = Window.orderBy("ntok", "doc_id")
    bucketed = tok.withColumn("bucket", F.ntile(8).over(wb))
    wr = Window.partitionBy("bucket").orderBy("ntok", "doc_id")
    batched = bucketed.withColumn(
        "batch", ((F.row_number().over(wr) - F.lit(1)) / F.lit(32)).cast("int")
    )
    per_batch = batched.groupBy("bucket", "batch").agg(
        F.count("*").alias("n"), F.max("ntok").alias("mx"), F.sum("ntok").alias("sm")
    )
    padded = F.sum(F.col("mx") * F.col("n"))
    real = F.sum("sm")
    return per_batch.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_batches"),
        padded.cast("bigint").alias("padded_tokens"),
        real.cast("bigint").alias("real_tokens"),
        floor_round6(
            (padded - real).cast("double") / padded.cast("double")
        ).alias("padding_frac"),
    ).select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_docs",
        "n_batches",
        "padded_tokens",
        "real_tokens",
        "padding_frac",
    )


def rfm_segments_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency/frequency/monetary quintile grid via three global
    ntiles over the customer-grain aggregate — the single-partition-
    window form of q206_rfm_distributed."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.ntile(5)
        .over(Window.orderBy(F.datediff(F.col("mx"), F.col("last_order")), F.col("o_custkey")))
        .alias("r_q"),
        F.ntile(5)
        .over(Window.orderBy(F.col("n_orders").desc(), F.col("o_custkey")))
        .alias("f_q"),
        F.ntile(5)
        .over(Window.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
        .alias("m_q"),
        "n_orders",
        "monetary",
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("total_orders"),
            floor_round6(F.sum("monetary").cast("double")).alias("total_monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )
