"""Grouped-map as-of join (`applyInPandas` + ``pd.merge_asof``).

The engine's primary as-of path is the broadcast interval join
(``operators.scd.scd_point_in_time_join``) — zero fact shuffle when the
dimension broadcasts. This variant is the fallback for when the
versioned side is TOO BIG to broadcast: both sides shuffle once on the
natural key, and each group resolves its timeline with a vectorized
``merge_asof`` in Arrow-batched pandas. Equivalence with the interval
join is pinned by tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def asof_join_grouped(
    fact: DataFrame,
    dim: DataFrame,
    natural_key: str,
    event_date_col: str,
    value_cols: list[str],
) -> DataFrame:
    """For each fact row, attach the dim version whose ``start_date`` is
    the latest one ≤ event date (validity enforced by construction:
    SCD versions tile the timeline). Output = fact columns + value_cols.
    """
    fact_cols = fact.columns
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in fact.schema.fields]
        + [f"{f.name} {f.dataType.simpleString()}" for f in dim.schema.fields if f.name in value_cols]
    )

    dim_small = dim.select(natural_key, "start_date", *value_cols)

    def _merge(facts: pd.DataFrame, dims: pd.DataFrame) -> pd.DataFrame:
        if dims.empty or facts.empty:
            empty = facts.head(0).copy()
            for c in value_cols:
                empty[c] = pd.Series(dtype=object)
            return empty
        # Arrow hands DateType over as object dtype; merge_asof needs an
        # ordered dtype, so key on datetime64 shadow columns
        facts = facts.assign(_ed=pd.to_datetime(facts[event_date_col])).sort_values("_ed")
        # same tiebreak as the SCD build (start_date, *attrs): among
        # versions sharing a start_date, merge_asof takes the LAST row,
        # which must be the non-zero-length interval's version
        dims = (
            dims.drop(columns=[natural_key])
            .assign(_sd=pd.to_datetime(dims["start_date"]))
            .sort_values(["_sd", *value_cols])
        )
        merged = pd.merge_asof(facts, dims, left_on="_ed", right_on="_sd", direction="backward")
        return merged[fact_cols + value_cols]

    return (
        fact.groupBy(natural_key)
        .cogroup(dim_small.groupBy(natural_key))
        .applyInPandas(_merge, out_schema)
    )
