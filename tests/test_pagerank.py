"""PageRank vs an independent pure-Python implementation (same fold
order → exact float equality), plus structural sanity."""

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.graph import (
    pagerank,
)

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select((-F.col("l_suppkey")).alias("src"), F.col("o_custkey").alias("dst"))
        .distinct()
    )


def _py_pagerank(edges, n_iter=3, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: 1.0 / float(n) for v in nodes}
    for _ in range(n_iter):
        inc = {}
        for s, t in edges:
            inc.setdefault(t, []).append((s, d * (r[s] / float(deg[s]))))
        r = {}
        for v in nodes:
            acc = 0.0
            for _, c in sorted(inc.get(v, [])):
                acc += c
            r[v] = (1.0 - d) / float(n) + acc
    return r


def test_pagerank_matches_pure_python_exactly(spark):
    edf = _edges(spark)
    edges = [(row["src"], row["dst"]) for row in edf.collect()]
    expected = _py_pagerank(edges)
    got = {row["node"]: row["r"] for row in pagerank(edf).collect()}
    assert got == expected  # bit-identical: same fold order, same trees


def test_pagerank_mass_and_positivity(spark):
    edf = _edges(spark)
    rows = pagerank(edf).collect()
    total = sum(r["r"] for r in rows)
    assert all(r["r"] > 0 for r in rows)
    # dangling nodes leak mass, so total <= 1, but the teleport floor
    # keeps at least (1-d) of it
    assert 0.15 <= total <= 1.0 + 1e-9
