"""Dump .explain('formatted') for the optimization round's touched
queries to plans/r16/<query>_<tag>.txt (judge evidence artifact).

    python tools/dump_r16_plans.py before [names...]
    python tools/dump_r16_plans.py after  [names...]

Default name set = the bench lists (headline + heavy). Input SF is
sf0.001 (plan SHAPE is SF-independent; tiny SF keeps the dump cheap) —
same convention as tools/dump_plans.py / PLANS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEAVY
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark import get_spark
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
    registry,
    release_persisted,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or (HEADLINE + HEAVY)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump-r16-plans")
    reg = registry()
    for name in names:
        df = reg[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(f"# {name} ({tag}) — explain('formatted') at {SF_DIR}\n\n{plan}")
        release_persisted()
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
