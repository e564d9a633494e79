"""Date dimension generation as native Column expressions.

The reference builds its calendar driver-side in pandas
(``/root/reference/dags/main_pipeline.py:296-389``): ``pd.date_range``
plus ``Series.map`` over Python season functions. Here the whole table
is generated distributed — ``F.sequence`` + ``explode`` for the
calendar spine and a ``when`` ladder for the astronomical seasons — so
it works for any range without a driver funnel and every derived
attribute stays inside whole-stage codegen.

Season boundaries (reference ``main_pipeline.py:315-331``):
spring Mar 21, summer Jun 22, autumn Sep 23, winter Dec 22.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def _on_or_after(month: int, day: int) -> Column:
    m, d = F.month("FullDate"), F.dayofmonth("FullDate")
    return (m > month) | ((m == month) & (d >= day))


def season_number_expr() -> Column:
    """1=spring 2=summer 3=autumn 4=winter (reference ``:336-354``)."""
    return (
        F.when(_on_or_after(12, 22) | ~_on_or_after(3, 21), F.lit(4))
        .when(_on_or_after(9, 23), F.lit(3))
        .when(_on_or_after(6, 22), F.lit(2))
        .otherwise(F.lit(1))
    )


def season_name_expr() -> Column:
    return F.element_at(
        F.array(F.lit("spring"), F.lit("summer"), F.lit("autumn"), F.lit("winter")),
        season_number_expr(),
    )


def build_date_dim(spark: SparkSession, min_date: Column | str, max_date: Column | str) -> DataFrame:
    """Continuous calendar [min_date, max_date] with the reference's 13
    derived attributes (``main_pipeline.py:307-366``; DDL
    ``CreateModel.sql:3-45``).

    ``DateId`` is day-offset from ``min_date`` + 1: deterministic,
    computed without any shuffle or window (the reference relied on SQL
    Server IDENTITY).

    ``DayOfWeekNumber`` is ISO 1=Monday..7=Sunday (pandas
    ``day_of_week + 1``, reference ``:311``); weekend = Sat/Sun.
    """
    lo = F.to_date(F.lit(min_date) if isinstance(min_date, str) else min_date)
    hi = F.to_date(F.lit(max_date) if isinstance(max_date, str) else max_date)
    # One partition on purpose: a calendar is domain-bounded (a full
    # century is ~36.5k rows) and the 14 derived attributes are scalar
    # expressions — sub-millisecond work at any realistic range. Every
    # consumer either broadcasts the dim onto a fact (q23/q24, the
    # warehouse pipeline) or materializes the tiny table itself (q20;
    # the pipeline write gets ONE output file instead of 32 near-empty
    # ones). The repartition this replaces added a round-robin
    # Exchange + a 32-task stage to every consumer for zero gain —
    # the r15 profile measured it as one of q23's 7 driver-gap jobs.
    spine = spark.range(1).select(F.explode(F.sequence(lo, hi)).alias("FullDate"))

    iso_dow = F.weekday("FullDate") + 1  # 1=Mon .. 7=Sun
    return spine.select(
        (F.datediff("FullDate", lo) + 1).alias("DateId"),
        "FullDate",
        F.dayofyear("FullDate").alias("DayOfYearNumber"),
        F.dayofmonth("FullDate").alias("DayOfMonthNumber"),
        iso_dow.alias("DayOfWeekNumber"),
        F.date_format("FullDate", "EEEE").alias("DayOfWeekName"),
        (iso_dow >= 6).alias("IsWeekend"),
        season_number_expr().alias("AstronomicalSeasonNumber"),
        season_name_expr().alias("AstronomicalSeasonName"),
        F.month("FullDate").alias("MonthNumber"),
        F.date_format("FullDate", "MMMM").alias("MonthLongName"),
        F.date_format("FullDate", "MMM").alias("MonthShortName"),
        F.year("FullDate").alias("Year"),
        F.date_format("FullDate", "yyyy/MM").alias("YearMonth"),
    )
