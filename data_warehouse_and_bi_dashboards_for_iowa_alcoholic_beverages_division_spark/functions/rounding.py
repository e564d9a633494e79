"""Cross-engine float rounding.

``F.round(double, 6)`` and DuckDB ``ROUND(double, 6)`` disagree for
values an ulp away from a 6dp tie: Spark rounds the shortest decimal
representation HALF_UP via BigDecimal, DuckDB rounds the binary float
product — verified divergence on real data (supply-cost ratios in the
Q2 shape). ``floor(x * 1e6 + 0.5) / 1e6`` is half-mode independent and
bit-identical on both engines, so every float-derived score in the
oracle-checked registry rounds through these helpers (the SQL fragment
is for the DuckDB side of the pair).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def floor_round6(col: Column) -> Column:
    """Half-mode-independent 6dp rounding of a double Column."""
    return F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)


def floor_round6_sql(expr: str) -> str:
    """The same rounding as :func:`floor_round6`, as SQL text.

    Existing oracle strings inline this formula verbatim rather than
    calling the helper (they are plain triple-quoted strings, some
    containing literal braces that make f-string conversion hazardous);
    ``tests/test_registry_invariants.py`` asserts every FLOOR in every
    oracle is exactly the canonical form, so a typo'd copy cannot land
    silently. Use this helper when building NEW oracle SQL."""
    return f"FLOOR(({expr}) * 1000000 + 0.5) / 1000000.0"
