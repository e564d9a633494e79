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


_TREE_NODE = re.compile(
    r"^(?P<prefix>[\s:+|-]*)\*?\s*(?P<name>[A-Za-z][\w ]*?)\s*\((?P<id>\d+)\)\s*$"
)


def _tree_nodes(plan: str) -> list[tuple[int, str, int]]:
    """(indent, node name, id) for each line of the formatted plan's
    tree section. Detail headers like ``(3) Exchange`` start with a
    parenthesis so the name-first regex skips them."""
    out = []
    for line in plan.splitlines():
        m = _TREE_NODE.match(line)
        if m:
            out.append((len(m.group("prefix")), m.group("name").strip(), int(m.group("id"))))
    return out


def _exchange_is_single_partition(plan: str, node_id: int) -> bool:
    for block in plan.split("\n\n"):
        lines = block.strip().splitlines()
        if lines and lines[0].strip().startswith(f"({node_id}) Exchange"):
            return any(
                ln.startswith("Arguments:") and "SinglePartition" in ln
                for ln in lines
            )
    return False


def _has_unpartitioned_window(plan: str) -> bool:
    """An unpartitioned window physically manifests as a Window node
    whose OWN child exchange is SinglePartition. The r10 rewrite
    matched '^(N) Window' and '^Arguments: SinglePartition' as two
    independent regexes over the whole plan text, so a properly
    partitioned window plus an unrelated SinglePartition exchange
    elsewhere (a global sort/limit, a scalar aggregate) false-positived
    (the r11 advisor finding). This version ties the two structurally:
    for each Window node in the tree, walk its single-child chain
    (Sort/Project pass-throughs, depth +3 per level in the formatted
    rendering) to the first Exchange and check THAT exchange's
    arguments."""
    nodes = _tree_nodes(plan)
    for i, (depth, name, _) in enumerate(nodes):
        if name != "Window":
            continue
        want = depth + 3
        for d, n, nid in nodes[i + 1 :]:
            if d != want:
                break  # left the window's single-child chain
            if n.startswith("Exchange"):
                if _exchange_is_single_partition(plan, nid):
                    return True
                break  # this window's partitioning is set; next window
            if n.startswith("Window") or n.startswith(("Sort", "Project", "Filter")):
                want += 3  # narrow pass-through; keep descending
                continue
            break  # scan/join/aggregate: no SinglePartition feed
    return False


def test_partitioned_window_plus_global_sort_is_not_flagged(spark):
    """The r11 advisor's false-positive shape: a PARTITIONED window
    followed by a global orderBy. The plan contains both a Window node
    and a rangepartitioning exchange (and a scalar-agg variant would
    contain Exchange SinglePartition) — the structural matcher must
    tie the check to the window's OWN child exchange and say no."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    w = W.partitionBy("c_nationkey").orderBy("c_custkey")
    windowed = d.select(
        "c_custkey", "c_nationkey", F.row_number().over(w).alias("rn")
    )
    # global sort variant (Exchange rangepartitioning downstream)
    assert not _has_unpartitioned_window(_plan(windowed.orderBy("c_custkey")))
    # scalar-aggregate variant (Exchange SinglePartition downstream of
    # the window, but NOT feeding it)
    scalar = windowed.agg(F.sum("rn").alias("s"))
    assert not _has_unpartitioned_window(_plan(scalar))


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
