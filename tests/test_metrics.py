"""Observation-based load metrics: one pass, correct numbers, gate."""

import pytest

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.metrics import (
    assert_load_quality,
    observed_quality,
    quality_report,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_observed_quality_counts(spark, tmp_path):
    orders = load_table(spark, SF_DIR, "orders")
    n = orders.count()
    df, obs = observed_quality(
        orders, key_cols=["o_orderkey"], not_null=["o_custkey", "o_totalprice"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    rep = quality_report(obs)
    assert rep["n_rows"] == n
    assert rep["null_o_custkey"] == 0
    assert rep["null_o_totalprice"] == 0
    # approx distinct within 10% of exact (o_orderkey is unique)
    assert abs(rep["approx_distinct_o_orderkey"] - n) / n < 0.1


def test_quality_gate_passes_and_fails(spark, tmp_path):
    import pyspark.sql.functions as F

    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "bad", F.when(F.col("o_orderkey") % 2 == 0, None).otherwise(F.lit(1))
    )
    df, obs = observed_quality(orders, not_null=["bad"])
    df.write.mode("overwrite").parquet(str(tmp_path / "out2"))
    with pytest.raises(ValueError, match="null_bad"):
        assert_load_quality(obs, max_null_fraction=0.1)

    df2, obs2 = observed_quality(load_table(spark, SF_DIR, "orders"), not_null=["o_custkey"])
    df2.write.mode("overwrite").parquet(str(tmp_path / "out3"))
    rep = assert_load_quality(obs2, min_rows=100)
    assert rep["n_rows"] >= 100
