"""One-shot audit (round 11): compare every query's Spark result dtypes
against its oracle's DuckDB output types (via DESCRIBE — planned, not
executed) under the exact cross-engine mapping the driver's type-aware
value hash assumes. The q100 round-10 driver-red showed the local gate
is value-stringified and type-blind; this closes that class.

Usage: python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# The family mapping lives in tools/check_correctness.py (the standing
# gate applies it on every sweep); this tool is the registry-wide
# one-shot that runs it without value comparison.
from check_correctness import type_mismatches  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
        registry,
        release_persisted,
    )
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.session import (
        get_spark,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    spark = get_spark()

    bad = 0
    for name, spec in registry().items():
        if spec.oracle is None:
            continue
        described = con.execute("DESCRIBE " + spec.oracle).fetchall()
        try:
            sdf = spec.fn(spark, sf)
            sdtypes = sdf.dtypes
        finally:
            release_persisted()
        duck_cols = {r[0] for r in described}
        for col, _ in sdtypes:
            if col not in duck_cols:
                print(f"MISMATCH {name}.{col}: missing from oracle output")
                bad += 1
        for msg in type_mismatches(sdtypes, described):
            print(f"MISMATCH {name}.{msg}")
            bad += 1
    print(f"{bad} type mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
