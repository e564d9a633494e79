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


RESIZE_SCHEMA = "media_id BIGINT, payload BINARY, n_bytes INT"


def resize_media(media: DataFrame, target_bytes: int = 4096) -> DataFrame:
    """Resize step of an image pipeline, shape-faithful: 1 payload in →
    1 (smaller, fixed-budget) payload out via ``mapInPandas``. The fake
    resizer truncates/cycles bytes to ``target_bytes`` (a real one
    decodes, scales, re-encodes — same signature, same batch shape).
    Output partitioning is inherited from the scan: no shuffle, the
    transform is embarrassingly parallel."""

    def _resize(batches):
        for pdf in batches:
            out_payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not b:
                    out_payloads.append(b"")
                elif len(b) >= target_bytes:
                    out_payloads.append(b[:target_bytes])
                else:
                    reps = target_bytes // len(b) + 1
                    out_payloads.append((b * reps)[:target_bytes])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payloads,
                    "n_bytes": [len(p) for p in out_payloads],
                }
            )

    return media.select("media_id", "payload").mapInPandas(_resize, RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame_len INT, frame_md5 STRING"


def sample_frames_chars(media_text: DataFrame, id_col: str, text_col: str, every: int = 2) -> DataFrame:
    """Frame sampling, shape-faithful: 1 video in → N sampled frames
    out (a flat-mapping ``mapInPandas`` — the output batch is LONGER
    than the input batch, the plumbing a real ffmpeg frame sampler
    needs). The fake codec chops the char payload into
    ``len % 16 + 1`` equal frames and keeps every ``every``-th; frame
    identity is the md5 of the frame content, so the whole pipeline is
    oracle-checkable in plain SQL."""
    import hashlib

    def _sample(batches):
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for mid, s in zip(pdf["media_id"], pdf["payload_text"]):
                n_frames = len(s) % 16 + 1
                flen = len(s) // n_frames
                for i in range(0, n_frames, every):
                    frame = s[i * flen : (i + 1) * flen]
                    ids.append(mid)
                    idxs.append(i)
                    lens.append(len(frame))
                    md5s.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_md5": md5s}
            )

    src = media_text.select(
        F.col(id_col).alias("media_id"), F.col(text_col).alias("payload_text")
    )
    return src.mapInPandas(_sample, FRAME_SCHEMA)


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
