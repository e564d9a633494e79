"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in
``data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark/``;
this module only adapts its query registry to the driver interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship star-join dashboard query (revenue/profit by weekday)
    at sf0.001."""
    return _q.registry()["q23_star_weekday"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in _q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _q.registry().items() if spec.oracle is not None}
