"""End-to-end demo: build the star warehouse from staged parquet, run
the incremental branch a second time (no-op), and serve the dashboard
KPIs from the written tables.

    python tools/run_pipeline_demo.py [sf_dir]

This is the reference's whole Airflow DAG (`dags/main_pipeline.py`) as
~30 lines of driver code over lakehouse tables.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark import get_spark
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.pipeline import (
    build_star_warehouse,
    read_warehouse,
    revenue_by_weekday,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import load_table
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.streaming.incremental import (
    load_or_update,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    base = tempfile.mkdtemp(prefix="iowa_wh_")
    spark = get_spark("pipeline-demo", cores=8)

    print(f"== full build ({sf_dir}) -> {base}")
    paths = build_star_warehouse(spark, sf_dir, base)
    wh = read_warehouse(spark, paths)
    print(f"   fact rows: {wh['fact_sales'].count():,}")

    print("== incremental re-run (watermark branch, expect no-op)")
    orders = load_table(spark, sf_dir, "orders")
    mode, n = load_or_update(spark, orders, os.path.join(base, "staged_orders"), "o_orderdate")
    mode2, n2 = load_or_update(spark, orders, os.path.join(base, "staged_orders"), "o_orderdate")
    print(f"   first: {mode} ({n:,} rows); second: {mode2} ({n2:,} rows)")
    assert n2 == 0, "idempotent re-run must append nothing"

    print("== dashboard: revenue / profit / sales by weekday")
    for r in revenue_by_weekday(wh).collect():
        print(f"   weekday {r['DayOfWeekNumber']}: rev={r['sum_rev']} sales={r['n_sales']}")

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
