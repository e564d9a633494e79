"""Multimodal plumbing: binary payload adapter, Arrow-batched feature
extraction, poison-payload tolerance (stubbed decoder)."""

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.multimodal import (
    documents_as_media,
    extract_features,
    fake_decode,
    real_decode_stub,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_media_adapter_schema(spark):
    media = documents_as_media(load_table(spark, SF_DIR, "documents"))
    assert dict(media.dtypes) == {
        "media_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "n_bytes": "int",
        "content_hash": "string",
    }
    row = media.orderBy("media_id").first()
    assert row["n_bytes"] == len(row["payload"]) and row["media_type"] == "text/plain"


def test_extract_features_fake_decoder(spark):
    media = documents_as_media(load_table(spark, SF_DIR, "documents"))
    feats = extract_features(media, decoder=fake_decode)
    rows = feats.collect()
    assert len(rows) == 500
    r = rows[0]
    assert r["width"] == r["n_bytes"] % 640
    assert r["height"] == (r["n_bytes"] * 7) % 480
    assert r["n_frames"] == r["n_bytes"] % 16


def test_extract_features_stub_decoder_yields_nulls(spark):
    """A decoder without codecs must not fail the job — features come
    back NULL, byte counts still populated."""
    media = documents_as_media(load_table(spark, SF_DIR, "documents")).limit(10)
    rows = extract_features(media, decoder=real_decode_stub).collect()
    assert len(rows) == 10
    assert all(r["width"] is None and r["height"] is None for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


def test_resize_media_fixed_budget(spark):
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.multimodal import (
        resize_media,
    )

    media = documents_as_media(load_table(spark, SF_DIR, "documents")).limit(20)
    out = resize_media(media, target_bytes=256).collect()
    assert len(out) == 20
    assert all(r["n_bytes"] == 256 for r in out)
    # short payloads cycle: prefix must equal the original payload start
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in out:
        orig = src[r["media_id"]]
        assert bytes(r["payload"])[: min(len(orig), 256)] == orig[: min(len(orig), 256)]


def test_sample_frames_deterministic_flatmap(spark):
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.multimodal import (
        sample_frames_chars,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    a = sample_frames_chars(docs, "doc_id", "text", every=2).collect()
    b = sample_frames_chars(docs, "doc_id", "text", every=2).collect()
    key = lambda r: (r["media_id"], r["frame_idx"], r["frame_len"], r["frame_md5"])
    assert sorted(map(key, a)) == sorted(map(key, b))
    assert len(a) > 30, "flat-map must expand rows (several frames per doc)"
    # every-2 sampling: only even frame indices survive
    assert all(r["frame_idx"] % 2 == 0 for r in a)
