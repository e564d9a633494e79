"""Semantic property checks for the training-data rewrite operators.

The DuckDB oracle gate proves Spark and the oracle compute the SAME
thing; these prove the thing computed has the properties the rewrite
CLAIMS — a bug implemented identically on both engines (the one class
cross-engine equality can't catch) fails here.
"""

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
    registry,
)

SF_DIR = "/root/testdata/sf0.001"


def _q(spark, name):
    return registry()[name].fn(spark, SF_DIR)


def test_fim_parts_partition_the_document(spark):
    # prefix + middle + suffix must be a PARTITION of the original
    # text: lengths sum to n_chars for fim rows, and ar rows pass
    # through whole
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.length("text").alias("L")
    )
    out = _q(spark, "q194_fim_transform").join(docs, "doc_id")
    bad = out.where(
        (F.col("n_prefix") + F.col("n_middle") + F.col("n_suffix")) != F.col("L")
    )
    assert bad.count() == 0
    modes = {r["mode"] for r in out.select("mode").distinct().collect()}
    assert modes == {"fim", "ar"}
    # FIM rows must have non-empty prefix (cut1 >= 1 by construction)
    assert out.where((F.col("mode") == "fim") & (F.col("n_prefix") < 1)).count() == 0


def test_pii_salt_detection_matches_injection_schedule(spark):
    # the deterministic salt injects exactly one email always, a phone
    # iff doc_id is even, an ip iff doc_id % 3 == 0 — detection counts
    # must reflect the schedule (organic corpus text contains none)
    out = _q(spark, "q191_pii_redaction")
    assert out.where(F.col("n_emails") < 1).count() == 0
    assert out.where((F.col("doc_id") % 2 == 0) & (F.col("n_phones") != 1)).count() == 0
    assert out.where((F.col("doc_id") % 2 != 0) & (F.col("n_phones") != 0)).count() == 0
    assert out.where((F.col("doc_id") % 3 == 0) & (F.col("n_ips") != 1)).count() == 0
    # redaction must strictly shrink every salted document (the
    # placeholders are shorter than the injected PII)
    assert out.where(F.col("redaction_delta") <= 0).count() == 0


def test_span_corruption_mask_schedule(spark):
    # exactly the first 3 tokens of every 20-token block are masked:
    # n_masked = 3 * full_blocks + min(3, tail)
    out = _q(spark, "q197_span_corruption")
    expected = F.expr(
        "CAST((n_tokens DIV 20) * 3 + least(n_tokens % 20, 3) AS INT)"
    )
    assert out.where(F.col("n_masked") != expected).count() == 0
    assert out.where(F.col("n_masked") > F.col("n_tokens")).count() == 0


def test_leakage_safe_split_never_splits_a_cluster(spark):
    # the whole point: every member of a duplicate cluster gets the
    # SAME fold — assert it directly rather than trusting construction
    out = _q(spark, "q196_leakage_safe_split")
    spread = out.groupBy("cluster_id").agg(
        F.count_distinct("fold").alias("nf"), F.count("*").alias("n")
    )
    assert spread.where(F.col("nf") != 1).count() == 0
    # and the planted dupes exist, so the property is non-vacuous
    assert spread.where(F.col("n") > 1).count() > 0
    # naive split demonstrably leaks on this corpus
    assert out.where("naive_would_leak").count() > 0


def test_ann_recall_bounds_and_bucket_consistency(spark):
    out = _q(spark, "q198_ann_recall").collect()
    assert len(out) == 5
    for r in out:
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall_at_10"] - r["n_hits"] / 10.0) < 1e-9
        # hits can never exceed what the bucket offered
        assert r["n_hits"] <= max(r["n_candidates"], 0) or r["n_candidates"] >= 10
