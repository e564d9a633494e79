"""Dense surrogate-key assignment: dense, unique, order-correct."""

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.functions.ids import (
    dense_ids,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_dense_ids_are_dense_and_unique(spark):
    orders = load_table(spark, SF_DIR, "orders")
    n = orders.count()
    got = dense_ids(orders).agg(
        F.count_distinct("id").alias("d"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert got["n"] == n
    assert got["d"] == n, "ids must be unique"
    assert got["lo"] == 0 and got["hi"] == n - 1, "ids must be dense 0..n-1"


def test_dense_ids_ordered_match_row_number(spark):
    orders = load_table(spark, SF_DIR, "orders").limit(2000)
    got = dense_ids(orders, order_by=["o_orderdate", "o_orderkey"]).select(
        "o_orderkey", "id"
    )
    from pyspark.sql import Window

    want = orders.select(
        "o_orderkey",
        (F.row_number().over(Window.orderBy("o_orderdate", "o_orderkey")) - 1).alias("id"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dense_ids_no_big_table_shuffle(spark):
    # unordered mode: the plan must not exchange the main branch —
    # only the tiny per-partition counts go through a shuffle/window
    orders = load_table(spark, SF_DIR, "orders")
    df = dense_ids(orders)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final, "offsets must broadcast-join back"
    assert "SortMergeJoin" not in final
