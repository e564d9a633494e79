"""Python UDTF escape hatch: row-for-row parity with the JVM
expression twin (q148's sequence+transform+posexplode chunker)."""

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.pyudtf import (
    ChunkDocument,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
    registry,
)

SF_DIR = "/root/testdata/sf0.001"


def test_udtf_chunker_matches_expression_twin(spark):
    spark.udtf.register("chunk_document", ChunkDocument)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["offset"], r["chunk_len"], r["chunk_md5"])
        for r in spark.sql(
            "SELECT doc_id, c.* FROM udtf_docs, LATERAL chunk_document(text) c"
        ).collect()
    }
    want = {
        (r["doc_id"], r["chunk_idx"]): (r["offset"], r["chunk_len"], r["chunk_md5"])
        for r in registry()["q148_doc_chunks"].fn(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > len({k[0] for k in got}), "overlap must create multi-chunk docs"
