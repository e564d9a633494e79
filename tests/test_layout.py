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


def test_zorder_write_bounds_both_dimensions(spark, tmp_path):
    # range-clustering on partkey alone bounds only partkey per file;
    # z-order must yield compact per-file ranges in BOTH dimensions
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.layout import (
        zorder_write,
    )
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
        load_table,
    )

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    path = str(tmp_path / "zordered")
    zorder_write(li, path, "l_partkey", "l_suppkey", bits=12, num_files=16)

    import pyarrow.parquet as pq
    import glob

    spans_a, spans_b = [], []
    all_pk, all_sk = [], []
    for f in glob.glob(path + "/*.parquet"):
        t = pq.read_table(f)
        pk, sk = t.column("l_partkey").to_pylist(), t.column("l_suppkey").to_pylist()
        if pk:
            spans_a.append(max(pk) - min(pk))
            spans_b.append(max(sk) - min(sk))
            all_pk.extend((min(pk), max(pk)))
            all_sk.extend((min(sk), max(sk)))
    # thresholds derive from the ACTUAL key spans of the written data,
    # so the assertion stays meaningful at any scale factor
    full_a = max(all_pk) - min(all_pk)
    full_b = max(all_sk) - min(all_sk)
    assert len(spans_a) >= 8
    # average per-file span must be well under the full key span in
    # BOTH dimensions — the property 1-D clustering cannot give (a
    # partkey-range-clustered write leaves suppkey spans ~= full_b,
    # and an unclustered write leaves both ~= full)
    assert sum(spans_a) / len(spans_a) < full_a * 0.5
    assert sum(spans_b) / len(spans_b) < full_b * 0.5


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.layout import (
        partitioned_write,
    )
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
        load_table,
    )
    import pyspark.sql.functions as F
    import contextlib
    import io

    orders = load_table(spark, "/root/testdata/sf0.001", "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    partitioned_write(orders, path, ["order_year"])

    df = spark.read.parquet(path).where(F.col("order_year") == 1997)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "order_year" in plan.split("PartitionFilters")[1].split("]")[0]
    # pruning is real: only the 1997 rows are read
    expected = orders.where(F.col("order_year") == 1997).count()
    assert df.count() == expected
