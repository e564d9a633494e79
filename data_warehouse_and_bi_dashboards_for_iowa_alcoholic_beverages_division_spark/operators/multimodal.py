"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
iterators (``mapInPandas``).

The container has no image/audio codecs, so the actual decode is
stubbed (``NotImplementedError``) behind ``decoder=``; everything
around it — schema contract, batch iteration, partition-level
parallelism, metadata extraction — is real and tested. Swapping in a
PIL/ffmpeg decoder changes one function, not the plan: at 100 TB the
shape is a parquet scan of (id, binary, meta) → ``mapInPandas`` with
bounded Arrow batches (no row-at-a-time serde, no driver funnel) →
columnar feature output.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# typed-metadata contract for opaque media payloads
MEDIA_META_FIELDS = "media_type STRING, n_bytes INT, content_hash STRING"


def documents_as_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Adapter: treat a string column as an opaque utf-8 payload so the
    binary pipeline is exercisable on the driver testdata (no real
    media files ship with the container)."""
    payload = F.encode(F.col(payload_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).alias("n_bytes").cast("int"),
        F.md5(payload).alias("content_hash"),
    )


def real_decode_stub(payload: bytes) -> dict:
    """Where a real codec plugs in (PIL.Image.open / soundfile /
    pyav). Deliberately unimplemented in this container."""
    raise NotImplementedError("media codecs are not available in this environment")


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives pseudo width/height/
    duration from the payload bytes so the full pipeline (schema,
    batching, output shape) runs and is oracle-checkable."""
    n = len(payload)
    return {"width": n % 640, "height": (n * 7) % 480, "n_frames": n % 16}


FEATURE_SCHEMA = "media_id BIGINT, n_bytes INT, width INT, height INT, n_frames INT"


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict] = fake_decode,
    batch_limit: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas``: one Arrow batch in,
    one columnar batch out; decode failures yield NULL features rather
    than failing the partition (at scale a poison payload must not kill
    a 10-hour job)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(payload)
                try:
                    feats = decoder(bytes(payload))
                    rows.append((mid, n, feats.get("width"), feats.get("height"), feats.get("n_frames")))
                except NotImplementedError:
                    rows.append((mid, n, None, None, None))
            out = pd.DataFrame(rows, columns=["media_id", "n_bytes", "width", "height", "n_frames"])
            if batch_limit:
                out = out.head(batch_limit)
            yield out

    return media.select("media_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)
