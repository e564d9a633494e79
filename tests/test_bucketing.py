"""Bucketed co-located join: correct rows AND a shuffle-free plan."""

import shutil

import pytest

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.bucketing import (
    co_located_join,
    write_bucketed,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"
BASE = "/root/repo/spark-warehouse/bucketing_test"  # gitignored


@pytest.fixture()
def bucketed_tables(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name", "c_nationkey")
    write_bucketed(
        orders.withColumnRenamed("o_custkey", "custkey"), "b_orders", "custkey", 8, f"{BASE}/b_orders"
    )
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "custkey"), "b_customer", "custkey", 8, f"{BASE}/b_customer"
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    shutil.rmtree(BASE, ignore_errors=True)


def test_co_located_join_no_shuffle_and_correct(spark, bucketed_tables):
    # force the non-broadcast path so the test exercises bucketing, not
    # the broadcast fast path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, "b_orders", "b_customer", "custkey")
        rows = joined.count()

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
        assert "SortMergeJoin" in plan

        # same rows as the plain (unbucketed) join
        orders = load_table(spark, SF_DIR, "orders")
        cust = load_table(spark, SF_DIR, "customer")
        expected = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
        assert rows == expected

        # and the totals agree, not just the cardinality
        got = joined.agg(F.sum(F.col("o_totalprice").cast("decimal(14,2)"))).collect()[0][0]
        exp = orders.join(cust, orders.o_custkey == cust.c_custkey).agg(
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        ).collect()[0][0]
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
