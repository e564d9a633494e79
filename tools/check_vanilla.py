"""Driver-conditions twin of check_correctness: runs the SAME compare
but on a VANILLA SparkSession (stock configs — 200 shuffle partitions,
default ANSI, no engine session tuning), the way the driver invokes
``__spark_entry__``. Catches results that secretly depend on the
engine session (partition-order float sums, config-gated behavior).

    python tools/check_vanilla.py [names...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    # build the vanilla session FIRST so get_spark's configs never apply
    spark = SparkSession.builder.master("local[8]").appName("vanilla-gate").getOrCreate()

    import check_correctness as cc  # reuse norm/compare helpers

    import duckdb

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.01"
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    names = sys.argv[1:] or sorted(qs)
    failures = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf)
            scols, srows = sdf.columns, sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows (no oracle)")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        if sorted(scols) != sorted(dcols) or len(srows) != len(drows):
            print(f"FAIL {name}: shape mismatch")
            failures += 1
            continue
        ns, nd = cc.norm_rows(scols, srows), cc.norm_rows(dcols, drows)
        if ns != nd:
            diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL {name}: values differ: {diff}")
            failures += 1
            continue
        print(f"PASS {name}: {len(srows)} rows")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo/tools")
    raise SystemExit(main())
