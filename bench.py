"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the `noop` sink
(no driver collect cost, no output I/O cost — pure plan execution).

Since round 9 every reported number is a PER-QUERY MEDIAN across
repeated runs (HEADLINE_REPS for the headline list, HEAVY_REPS for the
heavy tail), because BASELINE.md's round-8 spread study measured
±2-3x single-shot variance on sub-second queries — single shots were
manufacturing phantom regressions for the round-over-round compare.
Reps are interleaved round-robin (run the whole list, repeat) so a
transient box-wide stall inflates at most one rep of each query rather
than every rep of one query. "queries" carries the medians (same
shape as before, so cross-round totals stay comparable); "stats"
carries {median, min, max} per query for spread inspection.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of the registry: flagship agg, joins/set ops,
# windows, SCD build + as-of, star dashboards, dedup, ANN.
HEADLINE = [
    "q01_pricing_summary",
    "q09_topn_parts",
    "q14_except_all",
    "q16_count_distinct",
    "q21_scd_build",
    "q22_scd_as_of",
    "q23_star_weekday",
    "q26_rollup_geo",
    "q80_local_supplier_volume",
    "q30_dedup_exact",
    "q35_minhash_lsh",
    "q38_knn_cosine",
    "q43_sessionization",
    "q45_media_features",
    "q53_running_total",
    # skew-mitigation pair: same 90%-one-key join, salted vs AQE-split;
    # the two must stay within ~2x of each other (BASELINE.md)
    "q157_skew_join_salted",
    "q158_skew_join_aqe",
]

# The expensive tail, benched separately so a regression in the
# heaviest queries is visible in BENCH_r*.json (the headline list
# tracks only fast queries; a 2x regression here used to be invisible).
# Reported as "heavy_queries"/"heavy_total" alongside the headline
# metric — the headline total stays comparable across rounds.
HEAVY = [
    "q187_cluster_canonical",
    "q188_shingle_containment",
    "q190_semantic_dedup",
    "q199_ivf_incremental",
    "q202_source_overlap",
]

# Rep counts per the round-8 verdict ask (>=5 headline, >=3 heavy);
# overridable for quick local iteration (SPARK_GRAFT_BENCH_REPS=1).
HEADLINE_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
HEAVY_REPS = min(HEADLINE_REPS, int(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_REPS", "3")))


def main() -> None:
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark import get_spark
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
        registry,
        release_persisted,
    )

    spark = get_spark("bench")
    reg = registry()

    # warm JVM/codegen with the flagship shapes at tiny scale so the
    # timed runs measure steady-state execution, not first-query JIT
    for warm in ("q01_pricing_summary", "q23_star_weekday"):
        reg[warm].fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()

    def run_list(names: list[str], reps: int) -> dict[str, dict[str, float]]:
        samples: dict[str, list[float]] = {n: [] for n in names}
        for _ in range(reps):
            for name in names:
                t0 = time.time()
                reg[name].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                samples[name].append(time.time() - t0)
                release_persisted()  # free tracked caches between queries
        return {
            n: {
                "median": round(statistics.median(s), 3),
                "min": round(min(s), 3),
                "max": round(max(s), 3),
            }
            for n, s in samples.items()
        }

    headline_stats = run_list(HEADLINE, HEADLINE_REPS)
    heavy_stats = run_list(HEAVY, HEAVY_REPS)
    timings = {n: s["median"] for n, s in headline_stats.items()}
    heavy = {n: s["median"] for n, s in heavy_stats.items()}

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "heavy_total": round(sum(heavy.values()), 3),
                "heavy_queries": heavy,
                # per-query spread behind the medians above
                "stats": {**headline_stats, **heavy_stats},
                "reps": {"headline": HEADLINE_REPS, "heavy": HEAVY_REPS},
                "sf": sf,
                # the ACTIVE driver-checked window (first 50 of the
                # rotated registration order) — recorded per-round so
                # which queries the external hash gate verified is
                # auditable from the BENCH artifact alone, not from
                # reading _WINDOW_SWAPS in a particular commit
                "driver_window": list(reg)[:50],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
