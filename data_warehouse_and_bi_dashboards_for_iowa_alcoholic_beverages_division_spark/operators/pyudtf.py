"""Python UDTF escape hatch (Spark 4) — demonstrated, with a JVM twin.

Completes the demonstrated-UDF-surface set (scalar Arrow ``pandas_udf``
in similarity.py, ``mapInPandas`` in multimodal.py, cogrouped
``applyInPandas`` in asof.py, ``applyInPandasWithState`` in streaming):
a table function that turns one input row into N output rows with
imperative Python — the shape for generators whose row-splitting logic
genuinely can't be a Column expression (external tokenizers, format
parsers, model-driven segmenters).

Contract kept honest the same way as the other escape hatches: the
demo reimplements the q148 overlapping-chunker, and
``tests/test_udtf.py`` pins row-for-row parity against the pure
expression path (``sequence`` + ``transform`` + ``posexplode``), which
remains the production plan — a UDTF runs Python per row and cannot
join whole-stage codegen, so it is the LAST resort, not the default.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, offset bigint, chunk_len int, chunk_md5 string")
class ChunkDocument:
    """Overlapping 512-char windows with stride 384 over one document —
    the q148 semantics, imperatively. Yields at least one (possibly
    empty) chunk per document, like the expression twin."""

    WINDOW = 512
    STRIDE = 384

    def eval(self, text: str):  # noqa: D102 — the UDTF protocol method
        t = text or ""
        n = max(-(-(len(t) - self.WINDOW) // self.STRIDE) + 1, 1)
        for i in range(n):
            chunk = t[i * self.STRIDE : i * self.STRIDE + self.WINDOW]
            yield (
                i,
                i * self.STRIDE + 1,
                len(chunk),
                hashlib.md5(chunk.encode("utf-8")).hexdigest(),
            )
