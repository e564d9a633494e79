"""Tracked-persist hygiene: queries that cache a multi-consumer
intermediate (q139/q149/q154) must register it for release so the
long-lived sweep sessions (153-query gate, bench loop) do not
accumulate executor storage across queries."""

import pyspark.sql.functions as F  # noqa: F401

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
    registry,
    release_persisted,
)

SF_DIR = "/root/testdata/sf0.001"

TRACKED = ["q139_crosstab_expected", "q149_bigram_coherence", "q154_countmin_heavy_hitters"]


def _n_cached(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_tracked_persists_are_released(spark):
    release_persisted()  # start clean regardless of earlier tests
    reg = registry()
    base = _n_cached(spark)
    for name in TRACKED:
        reg[name].fn(spark, SF_DIR).collect()
    assert _n_cached(spark) >= base + len(TRACKED), (
        "expected each tracked query to leave one materialized cache"
    )
    assert release_persisted() >= len(TRACKED)
    assert _n_cached(spark) == base, "release_persisted left cached RDDs behind"


def test_release_is_idempotent_and_queries_rebuild(spark):
    reg = registry()
    assert release_persisted() == 0
    # a released query re-persists and stays correct on the next build
    rows1 = sorted(map(tuple, reg[TRACKED[0]].fn(spark, SF_DIR).collect()))
    release_persisted()
    rows2 = sorted(map(tuple, reg[TRACKED[0]].fn(spark, SF_DIR).collect()))
    release_persisted()
    assert rows1 == rows2
