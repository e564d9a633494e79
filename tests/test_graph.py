"""Connected-components / dedup-cluster tests (operators/graph.py)."""

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def _components(spark, nodes, edges):
    v = spark.createDataFrame([(n,) for n in nodes], "node long")
    e = spark.createDataFrame(edges or [(None, None)], "src long, dst long").where(
        F.col("src").isNotNull()
    )
    rows = connected_components(v, e).collect()
    return {r["node"]: r["comp"] for r in rows}

def test_chain_converges_across_rounds(spark):
    # a 7-node path needs several propagation rounds, not just one
    comp = _components(spark, range(1, 8), [(i, i + 1) for i in range(1, 7)])
    assert comp == {n: 1 for n in range(1, 8)}


def test_two_cliques_and_singleton(spark):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 10)]
    comp = _components(spark, [1, 2, 3, 10, 11, 99], edges)
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_orientation_irrelevant(spark):
    # same component regardless of src/dst order
    assert _components(spark, [1, 2, 3], [(3, 2), (2, 1)]) == {1: 1, 2: 1, 3: 1}


def test_dedup_clusters_keep_list(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in [5, 6, 7, 8]], "doc_id long, text string")
    pairs = spark.createDataFrame([(6, 7)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert rows[6]["cluster_id"] == 6 and rows[7]["cluster_id"] == 6
    assert rows[6]["keep"] and not rows[7]["keep"]
    # singletons keep themselves
    assert rows[5]["keep"] and rows[8]["keep"]
    assert sum(r["keep"] for r in rows.values()) == 3
