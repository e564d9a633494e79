"""Bloom-filter join pruning: correctness properties.

The contract that makes the operator safe to put in front of a join at
any scale is *no false negatives* — the pruned fact stream must be a
superset of the true matches, so `prune → exact join` is result-
identical to the plain join. The word vector must also match a
bit-for-bit independent Python construction (same md5 family), since
the q159 oracle re-derives it in DuckDB.
"""

import hashlib

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators import (
    bloomfilter,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_hash(key: int, i: int) -> int:
    return int(hashlib.md5(f"{key}#{i}".encode()).hexdigest()[:15], 16)


def _py_bloom(keys, m_bits: int, k: int) -> list[int]:
    words = [0] * bloomfilter.n_words(m_bits)
    for key in keys:
        for i in range(k):
            pos = _py_hash(key, i) % m_bits
            words[pos // bloomfilter.WORD_BITS] |= 1 << (pos % bloomfilter.WORD_BITS)
    return words


def test_word_vector_matches_independent_python_build(spark):
    sup = (
        spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        .where("s_acctbal > 5000")
        .select(F.col("s_suppkey").alias("key"))
        .distinct()
    )
    keys = [r["key"] for r in sup.collect()]
    assert keys, "fixture filter must keep some suppliers"
    for m_bits, k in [(64, 2), (4096, 3)]:
        got = bloomfilter.bloom_build(sup, "key", m_bits=m_bits, k=k)
        assert got == _py_bloom(keys, m_bits, k)
        assert len(got) == bloomfilter.n_words(m_bits)
        assert all(0 <= w < (1 << bloomfilter.WORD_BITS) for w in got)


def test_no_false_negatives_and_join_transparency(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    sup = (
        spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        .where("s_acctbal > 5000")
        .select(F.col("s_suppkey").alias("key"))
        .distinct()
    )
    for m_bits, k in [(64, 2), (4096, 3)]:
        words = bloomfilter.bloom_build(sup, "key", m_bits=m_bits, k=k)
        pruned = bloomfilter.bloom_prune(li, "l_suppkey", words, m_bits=m_bits, k=k)
        # every true match survives the prune
        true_match = li.join(F.broadcast(sup), li["l_suppkey"] == sup["key"], "left_semi")
        assert true_match.exceptAll(pruned.select("l_orderkey", "l_suppkey")).count() == 0
        # prune-then-join == plain join, row for row
        a = pruned.join(F.broadcast(sup), pruned["l_suppkey"] == sup["key"], "left_semi")
        assert a.exceptAll(true_match).count() == 0
        assert true_match.exceptAll(a).count() == 0


def test_dense_filter_prunes_most_nonmatching_rows(spark):
    # with a production-sized filter the false-positive rate over the
    # non-member key population must be small — this is the whole point
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_suppkey")
    sup = (
        spark.read.parquet(f"{SF_DIR}/supplier.parquet")
        .where("s_acctbal > 5000")
        .select(F.col("s_suppkey").alias("key"))
        .distinct()
    )
    words = bloomfilter.bloom_build(sup, "key", m_bits=4096, k=3)
    n_cand = bloomfilter.bloom_prune(li, "l_suppkey", words, m_bits=4096, k=3).count()
    n_true = li.join(F.broadcast(sup), li["l_suppkey"] == sup["key"], "left_semi").count()
    n_total = li.count()
    assert n_true <= n_cand <= n_total
    # false-positive rows are under 5% of the non-matching population
    assert (n_cand - n_true) <= 0.05 * max(n_total - n_true, 1)
