"""Load-time data-quality metrics via ``df.observe``.

The reference audits its loads with separate counting queries
(``ingest_utils.py:86`` ``count()`` materializations, and the DAG's
row-count checks) — every audit is an extra pass over the data. Spark's
``Observation`` API attaches accumulator-backed metrics to the SAME
action that writes the data: at 100 TB the quality numbers are free,
computed in the pass that was already running.

Usage::

    df, obs = observed_quality(raw, key_cols=["o_orderkey"],
                               not_null=["o_custkey", "o_totalprice"])
    df.write.parquet(dest)          # one pass: write + metrics
    report = quality_report(obs)    # {'n_rows': ..., 'null_o_custkey': ...}
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation


def observed_quality(
    df: DataFrame,
    *,
    key_cols: list[str] | None = None,
    not_null: list[str] | None = None,
    name: str = "load_quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count, per-column null-count, and approximate
    key-cardinality metrics to ``df``'s next action."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in not_null or []:
        metrics.append(F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"))
    for c in key_cols or []:
        metrics.append(F.approx_count_distinct(c).alias(f"approx_distinct_{c}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def quality_report(obs: Observation) -> dict:
    """Metrics dict; blocks until the observed action has run."""
    return dict(obs.get)


def assert_load_quality(
    obs: Observation,
    *,
    min_rows: int = 1,
    max_null_fraction: float = 0.0,
) -> dict:
    """Fail-fast gate on a finished load: row floor + null budget on
    every observed ``null_*`` metric. Returns the report on success."""
    rep = quality_report(obs)
    n = rep["n_rows"]
    if n < min_rows:
        raise ValueError(f"load produced {n} rows; expected >= {min_rows}")
    for k, v in rep.items():
        if k.startswith("null_") and n and (v / n) > max_null_fraction:
            raise ValueError(f"{k}: {v}/{n} nulls exceeds budget {max_null_fraction}")
    return rep
