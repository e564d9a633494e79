"""Grouped-map (cogroup applyInPandas) as-of join must agree with the
broadcast interval join on the same SCD dimension."""

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.asof import (
    asof_join_grouped,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.scd import (
    create_scd_from_input,
    scd_point_in_time_join,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_grouped_asof_equals_interval_join(spark):
    log = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("change_date")
    )
    scd = create_scd_from_input(log, ["user_id", "event_type"], "change_date", "user_id")
    fact = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("event_date")
    )

    via_interval = scd_point_in_time_join(fact, scd, "user_id", "event_date").select(
        "event_id", F.col("event_type").alias("version_type")
    )
    via_grouped = asof_join_grouped(fact, scd, "user_id", "event_date", ["event_type"]).select(
        "event_id", F.col("event_type").alias("version_type")
    )

    a = {(r["event_id"], r["version_type"]) for r in via_interval.collect()}
    b = {(r["event_id"], r["version_type"]) for r in via_grouped.collect()}
    assert a == b and len(a) == fact.count()
