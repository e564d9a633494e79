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


def _cached_ids(spark) -> set:
    return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}


def test_tracked_persists_are_released(spark):
    # compare RDD-id SETS, not counts: earlier tests' localCheckpoint
    # RDDs (pagerank, connected components) are unpersisted by the
    # async ContextCleaner whenever their DataFrames get GC'd, so
    # absolute storage counts can shrink concurrently mid-test
    release_persisted()  # start clean regardless of earlier tests
    reg = registry()
    try:
        base = _cached_ids(spark)
        for name in TRACKED:
            reg[name].fn(spark, SF_DIR).collect()
        added = _cached_ids(spark) - base
        assert len(added) >= len(TRACKED), (
            "expected each tracked query to leave one materialized cache"
        )
    finally:
        n = release_persisted()
    assert n >= len(TRACKED)
    leftover = _cached_ids(spark) & added
    assert not leftover, f"release_persisted left cached RDDs behind: {leftover}"


def test_release_is_idempotent_and_queries_rebuild(spark):
    reg = registry()
    release_persisted()  # drain whatever earlier tests tracked
    assert release_persisted() == 0, "second release must find nothing"
    # a released query re-persists and stays correct on the next build
    rows1 = sorted(map(tuple, reg[TRACKED[0]].fn(spark, SF_DIR).collect()))
    release_persisted()
    rows2 = sorted(map(tuple, reg[TRACKED[0]].fn(spark, SF_DIR).collect()))
    release_persisted()
    assert rows1 == rows2
