"""Range-clustered writes: per-file min/max ranges must be disjoint so
footer statistics can prune whole files for range predicates."""

import glob

import pyarrow.parquet as pq

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.layout import (
    clustered_write,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def _file_ranges(path: str, col: str):
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    return sorted(ranges)


def test_clustered_write_disjoint_file_ranges(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    dest = str(tmp_path / "orders_clustered")
    clustered_write(orders, dest, ["o_orderdate"], num_files=8)

    ranges = _file_ranges(dest, "o_orderdate")
    assert len(ranges) >= 2, "expected multiple output files"
    # equal keys never split across range partitions → strictly disjoint
    for (_, prev_hi), (nxt_lo, _) in zip(ranges, ranges[1:]):
        assert nxt_lo > prev_hi

    back = spark.read.parquet(dest)
    assert back.count() == orders.count()


def test_clustered_write_round_trips_values(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    dest = str(tmp_path / "orders_kv")
    clustered_write(orders, dest, ["o_orderdate", "o_orderkey"], num_files=4)
    back = spark.read.parquet(dest)
    assert back.exceptAll(orders).count() == 0
    assert orders.exceptAll(back).count() == 0
