"""Bloom-filter join pruning — the runtime-filter pattern.

Beyond-reference layer. At 100 TB the dominant cost of a selective
dimension join is scanning (and shuffling) fact rows that can never
match. Spark's own runtime row-group filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) applies the same
idea inside Catalyst; this module implements it explicitly so that

- the filter construction is *engine-portable* (md5-prefix hash family,
  exact 64-bit integer math) and therefore externally verifiable in
  DuckDB — the false-positive set itself is value-checked cross-engine;
- the probe is a pure JVM expression over literal words, so it pushes
  into the fact scan stage: no shuffle, no join, no Python, and the
  fact rows eliminated by the filter never reach the exchange that the
  real join performs afterwards.

Scale contract: the build side aggregates k bit positions per distinct
key into ``ceil(m_bits / 60)`` 60-bit words with a ``bit_or`` — one
map-side-combined shuffle of at most ``n_words`` groups — and collects
only the word vector to the driver (kilobytes, the same bounded-collect
contract as IVF centroids in ``similarity.py``). Probing is
embarrassingly parallel. False positives are removed by the exact join
that follows; a Bloom filter has **no false negatives**, so the final
result is identical to the unfiltered join (property-tested in
``tests/test_bloom.py``).

Words hold 60 bits, not 64: bit positions stay <= 59 so every word is
a positive BIGINT on both engines — no sign-bit arithmetic differences,
and ``pow(2.0, b)`` (a power of two, exactly representable) casts to
an exact long where a per-row ``shiftleft`` would need a literal count.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

WORD_BITS = 60


def n_words(m_bits: int) -> int:
    return (m_bits + WORD_BITS - 1) // WORD_BITS


def bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for ``key``: 60-bit md5-prefix of ``key#i``
    reduced mod ``m_bits``. Pure JVM expressions, reproducible in any
    engine with md5 (DuckDB twin inlined in the q159 oracle)."""
    out: list[Column] = []
    for i in range(k):
        h = (
            F.conv(
                F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"#{i}"))), 1, 15),
                16,
                10,
            )
            .cast("long")
            .alias(f"h{i}")
        )
        out.append(h % m_bits)
    return out


def bloom_build(df: DataFrame, key_col: str, *, m_bits: int = 4096, k: int = 3) -> list[int]:
    """Build the filter over the distinct keys of ``df`` and return it
    as a list of ``n_words(m_bits)`` non-negative word values.

    One aggregation: explode the k positions per key, ``bit_or`` the
    single-bit words per word index (partial aggregation combines
    map-side), then collect the <= n_words rows. Missing words (no bit
    set) are filled with 0.
    """
    pos = df.select(
        F.explode(F.array(*bit_positions(F.col(key_col), m_bits, k))).alias("pos")
    )
    rows = (
        pos.groupBy(F.expr(f"pos DIV {WORD_BITS}").alias("w"))
        .agg(
            F.bit_or(
                F.pow(F.lit(2.0), F.col("pos") % WORD_BITS).cast("long")
            ).alias("bits")
        )
        .collect()
    )
    got = {r["w"]: r["bits"] for r in rows}
    return [int(got.get(i, 0)) for i in range(n_words(m_bits))]


def bloom_might_contain(key: Column, words: list[int], m_bits: int, k: int) -> Column:
    """Membership predicate against a driver-side word vector, injected
    as a literal array so the check runs inside the scan stage."""
    arr = F.array(*[F.lit(w) for w in words])
    conds: list[Column] = []
    for pos in bit_positions(key, m_bits, k):
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + F.lit(1))
        bit = F.pow(F.lit(2.0), pos % WORD_BITS).cast("long")
        conds.append(word.bitwiseAND(bit) != F.lit(0))
    return reduce(lambda a, b: a & b, conds)


def bloom_prune(
    fact: DataFrame, key_col: str, words: list[int], *, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Filter ``fact`` to rows whose key might be in the build set.
    Guaranteed superset of the true matches (no false negatives)."""
    return fact.where(bloom_might_contain(F.col(key_col), words, m_bits, k))
