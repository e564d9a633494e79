"""Partition-order tripwire for the IVF Lloyd step.

``ivf_train_centroids`` computes per-dimension means with ``F.avg`` —
an IEEE-double sum whose accumulation order follows the partitioning.
The 6dp floor-round makes a flip possible only when a mean lands
within an ulp of a 0.5e-6 boundary, but on regenerated data that is a
coin-flip class (the same one the decimal canonicalization work
eliminated elsewhere), and a flipped centroid component cascades into
a different q67/q156/q178 assignment. This tripwire re-trains under
adversarial partitionings and demands bit-identical rounded
centroids: if a testdata regen ever lands on a boundary, this fails
loudly instead of the oracle gate failing mysteriously.

Same policy as tests/test_ts_normalization.py: convert silent
environment-dependence into a named, diagnosable failure.
"""

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.similarity import (
    ivf_train_centroids,
    pq_train,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_centroids_invariant_under_repartitioning(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    base = ivf_train_centroids(emb, n_cells=8, iters=2)
    for variant in (
        emb.repartition(7),
        emb.repartition(3, "vec_id"),
        emb.coalesce(1),
    ):
        got = ivf_train_centroids(variant, n_cells=8, iters=2)
        assert got == base, (
            "IVF centroids changed under a different partitioning — a "
            "per-dimension mean landed on a 0.5e-6 rounding boundary; "
            "make the Lloyd fold order-deterministic for this data"
        )


def test_pq_codebooks_invariant_under_repartitioning(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    base = pq_train(emb, m=4, k=8, iters=1)
    got = pq_train(emb.repartition(5), m=4, k=8, iters=1)
    assert got == base, (
        "PQ codebooks changed under a different partitioning — same "
        "boundary class as the IVF tripwire above"
    )
