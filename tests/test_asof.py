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


class TestIntervalOverlapJoin:
    def test_bucketed_equals_naive_theta_join(self, spark):
        # the bucket-explode + emit-once algorithm must produce EXACTLY
        # the naive theta-join pairs, including intervals spanning many
        # buckets on BOTH sides, zero-length intervals, and
        # bucket-boundary-touching pairs
        import random

        import pyspark.sql.functions as F

        from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.ranges import (
            interval_overlap_join,
        )

        rng = random.Random(7)
        base = 1_700_000_000
        rows_a, rows_b = [], []
        for i in range(120):
            s = base + rng.randrange(0, 200_000)
            rows_a.append((i, s, s + rng.choice([0, 30, 3_600, 40_000])))
        for j in range(120):
            s = base + rng.randrange(0, 200_000)
            rows_b.append((j, s, s + rng.choice([0, 60, 7_200, 25_000])))

        a = spark.createDataFrame(rows_a, "a_id long, sa long, ea long").select(
            "a_id",
            F.timestamp_seconds("sa").alias("a_start"),
            F.timestamp_seconds("ea").alias("a_end"),
        )
        b = spark.createDataFrame(rows_b, "b_id long, sb long, eb long").select(
            "b_id",
            F.timestamp_seconds("sb").alias("b_start"),
            F.timestamp_seconds("eb").alias("b_end"),
        )

        fast = interval_overlap_join(
            a, b, a_start="a_start", a_end="a_end",
            b_start="b_start", b_end="b_end", bucket_seconds=3600,
        )
        naive = a.crossJoin(b).where(
            (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
        )
        got = sorted((r.a_id, r.b_id) for r in fast.select("a_id", "b_id").collect())
        want = sorted((r.a_id, r.b_id) for r in naive.select("a_id", "b_id").collect())
        assert got == want
        assert len(got) == len(set(got)), "emit-once rule must not duplicate pairs"
        assert len(want) > 100, "fixture must actually produce overlaps"
