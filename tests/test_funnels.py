"""Pins for plans/funnels.py — the single-partition-window
anti-pattern demonstrations that replaced the registered global-ntile
queries (q94/q171/q184) when the scale-safe devices (q204/q207/q206)
became the registered defaults.

Three contracts:

1. each funnel's plan really does contain an UNPARTITIONED window —
   the anti-pattern is demonstrated by the plan, not described;
2. ``length_bucketed_batches_funnel`` returns exactly
   ``q207_batch_padding_distributed``'s rows (per-bucket padding stats
   are tiebreak-invariant, so the window and window-free forms agree
   bit-for-bit — they shared one oracle while both were registered);
3. the decile/RFM funnels cover the identical population as their
   distributed twins (band counts sum to the table cardinality) —
   per-band counts are deliberately NOT asserted equal, because ntile
   splits boundary tie-groups by row rank while exact-threshold
   banding sends whole tie-groups to the lower band.
"""

from __future__ import annotations

import contextlib
import io
import re

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans import funnels
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
    registry,
    release_persisted,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _has_unpartitioned_window(plan: str) -> bool:
    """An unpartitioned window physically manifests as a Window node fed
    through an ``Exchange`` whose arguments are ``SinglePartition`` —
    match THAT, not substrings of the windowspecdefinition text (the
    old check treated any spec whose first comma-token contained
    ' ASC'/' DESC' as unpartitioned, which a partitioned window over a
    sort_array/CASE partition expression could false-positive — the
    r10 advisor finding)."""
    return (
        re.search(r"^\(\d+\) Window", plan, re.MULTILINE) is not None
        and re.search(r"^Arguments: SinglePartition", plan, re.MULTILINE) is not None
    )


def test_funnels_demonstrate_the_unpartitioned_window(spark):
    for fn in (
        funnels.balance_deciles_funnel,
        funnels.length_bucketed_batches_funnel,
        funnels.rfm_segments_funnel,
    ):
        plan = _plan(fn(spark, SF_DIR))
        assert _has_unpartitioned_window(plan), (
            f"{fn.__name__} must carry the single-partition window it "
            "exists to demonstrate"
        )


def test_length_bucketed_funnel_equals_q207_exactly(spark):
    reg = registry()
    funnel = {
        tuple(r) for r in funnels.length_bucketed_batches_funnel(spark, SF_DIR).collect()
    }
    distributed = {
        tuple(r) for r in reg["q207_batch_padding_distributed"].fn(spark, SF_DIR).collect()
    }
    release_persisted()
    assert funnel == distributed


def test_decile_funnel_and_q204_cover_the_same_population(spark):
    reg = registry()
    f = funnels.balance_deciles_funnel(spark, SF_DIR).collect()
    d = reg["q204_decile_thresholds"].fn(spark, SF_DIR).collect()
    release_persisted()
    assert {r["decile"] for r in f} == set(range(1, 11))
    assert {r["decile"] for r in d} == set(range(1, 11))
    assert sum(r["n_custs"] for r in f) == sum(r["n_custs"] for r in d)


def test_rfm_funnel_and_q206_cover_the_same_population(spark):
    reg = registry()
    f = funnels.rfm_segments_funnel(spark, SF_DIR).collect()
    d = reg["q206_rfm_distributed"].fn(spark, SF_DIR).collect()
    release_persisted()
    assert sum(r["n_customers"] for r in f) == sum(r["n_customers"] for r in d)
    assert sum(r["total_orders"] for r in f) == sum(r["total_orders"] for r in d)
