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


def test_snapshot_diff_bucketed_join_no_shuffle(spark):
    """q210's docstring promise, made mechanical: with both corpus
    snapshots stored bucketed by doc_id, snapshot_diff's full-outer
    join runs with ZERO Exchange (both bucketed scans already satisfy
    the join's required partitioning) — the only shuffle left in the
    whole query is the tiny (source, status) count. Values must match
    the unbucketed q210 exactly."""
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.text import (
        snapshot_diff,
    )
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
        registry,
    )

    base = f"{BASE}/snapshots"
    docs = load_table(spark, SF_DIR, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    old = docs.where(F.col("doc_id") % 13 != 0).select("doc_id", "source", fp.alias("f"))
    new = docs.where(F.col("doc_id") % 17 != 0).select(
        "doc_id",
        "source",
        F.md5(
            F.trim(
                F.regexp_replace(
                    F.lower(
                        F.when(
                            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" rev2"))
                        ).otherwise(F.col("text"))
                    ),
                    r"\s+",
                    " ",
                )
            )
        ).alias("f"),
    )
    write_bucketed(old, "b_snap_old", "doc_id", 8, f"{base}/old")
    write_bucketed(new, "b_snap_new", "doc_id", 8, f"{base}/new")
    try:
        diff = snapshot_diff(spark.table("b_snap_old"), spark.table("b_snap_new"))

        # plan pin: the join stage reads both bucketed scans in place.
        # Strip the final single-shuffle aggregate by checking the plan
        # of the pre-aggregate join itself, then count exchanges in the
        # full query: exactly one (the (source, status) count), and it
        # sits ABOVE the SortMergeJoin FullOuter.
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "FullOuter" in plan, plan
        join_tail = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_tail, (
            f"exchange below the full-outer join — bucketed scans not used:\n{plan}"
        )

        got = {(r["source"], r["status"]): r["n_docs"] for r in diff.collect()}
        exp = {
            (r["source"], r["status"]): r["n_docs"]
            for r in registry()["q210_corpus_diff"].fn(spark, SF_DIR).collect()
        }
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS b_snap_old")
        spark.sql("DROP TABLE IF EXISTS b_snap_new")
        shutil.rmtree(base, ignore_errors=True)
