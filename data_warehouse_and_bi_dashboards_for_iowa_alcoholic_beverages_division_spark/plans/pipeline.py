"""End-to-end warehouse build: the reference's full-load DAG
(``/root/reference/dags/main_pipeline.py`` TaskGroup
``load_full_data_into_warehouse``) as one idempotent driver function
over parquet lakehouse tables.

Write layout is chosen for 100 TB, not for the local testdata:

- the fact table is partitioned by ``sale_year`` (at production scale:
  by date) so incremental loads append new partitions and
  time-predicated queries prune old ones;
- dimensions are small unpartitioned parquet, rewritten atomically on
  SCD merge (`apply_scd_changes`) — the distributed replacement for the
  reference's driver-side row UPDATEs;
- every dimension carries the −1/'unknown' member row the reference
  inserts via SQL (``insert_unknown_into_*.sql``), so late/NULL-keyed
  facts always join.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.dates import build_date_dim
from .warehouse import fact_sales, geo_dim


def _with_unknown_member(dim: DataFrame, key_col: str, str_defaults: dict[str, str] | None = None) -> DataFrame:
    """Append the unknown-member row: key −1, strings 'unknown',
    everything else NULL (reference pattern, CreateModel.sql + the
    insert_unknown SQL scripts)."""
    defaults = dict(str_defaults or {})
    cols = []
    for f in dim.schema.fields:
        if f.name == key_col:
            cols.append(F.lit(-1).cast(f.dataType).alias(f.name))
        elif f.name in defaults:
            cols.append(F.lit(defaults[f.name]).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    row = dim.sparkSession.range(1).select(*cols)
    return dim.unionByName(row)


def build_star_warehouse(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Full load: derive all dims + the fact table from the staged
    lakehouse tables and write them as parquet. Returns {table: path}.
    Idempotent (mode=overwrite) — the 'create' branch of the
    reference's create-vs-update DAG."""
    paths = {name: os.path.join(out_dir, name) for name in ("dim_date", "dim_geo", "dim_item", "dim_vendor", "fact_sales")}

    fact = fact_sales(spark, sf_dir)
    bounds = fact.agg(F.min("sale_date").alias("lo"), F.max("sale_date").alias("hi")).collect()[0]

    # calendar spans the data + 5 years of headroom (reference
    # main_pipeline.py:305)
    date_dim = build_date_dim(spark, str(bounds["lo"]), str(bounds["hi"])).withColumn(
        "FullDate", F.col("FullDate")
    )
    date_dim.write.mode("overwrite").parquet(paths["dim_date"])

    _with_unknown_member(
        geo_dim(spark, sf_dir), "c_custkey", {"c_name": "unknown", "nation_name": "unknown", "region_name": "unknown"}
    ).write.mode("overwrite").parquet(paths["dim_geo"])

    from ..sources.tables import load_table

    _with_unknown_member(load_table(spark, sf_dir, "part"), "p_partkey", {"p_name": "unknown"}).write.mode(
        "overwrite"
    ).parquet(paths["dim_item"])
    _with_unknown_member(load_table(spark, sf_dir, "supplier"), "s_suppkey", {"s_name": "unknown"}).write.mode(
        "overwrite"
    ).parquet(paths["dim_vendor"])

    (
        fact.withColumn("sale_year", F.year("sale_date"))
        .write.mode("overwrite")
        .partitionBy("sale_year")
        .parquet(paths["fact_sales"])
    )
    return paths


def read_warehouse(spark: SparkSession, paths: dict[str, str]) -> dict[str, DataFrame]:
    return {name: spark.read.parquet(p) for name, p in paths.items()}


def revenue_by_weekday(wh: dict[str, DataFrame]) -> DataFrame:
    """Flagship dashboard query served from the WRITTEN warehouse
    (vs plans.queries.q23 which derives from base tables)."""
    fact, dates = wh["fact_sales"], wh["dim_date"]
    return (
        fact.join(F.broadcast(dates), fact["sale_date"] == dates["FullDate"], "inner")
        .groupBy("DayOfWeekNumber", "DayOfWeekName")
        .agg(
            F.sum("revenue_usd").alias("sum_rev"),
            F.sum("gross_profit_usd").alias("sum_profit"),
            F.count("*").alias("n_sales"),
        )
    )
