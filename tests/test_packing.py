"""Property-based invariants for sequence packing (concat-and-chunk).

For ANY document set and ANY input partitioning:
1. offsets are the exact prefix sums of token counts in (stream,
   order) order — pack assignment is a pure function of the data;
2. token mass is conserved: per-stream sum of tokens == last offset +
   last doc's tokens;
3. packs are contiguous per stream: the set of pack_ids is exactly
   0..max_pack;
4. a doc spans iff its token range crosses a budget boundary;
5. repartitioning the input arbitrarily changes nothing (cluster-shape
   independence — the property a 1000-executor run relies on).
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.packing import (
    pack_offsets,
)

BUDGET = 16

docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr"]),  # stream
        st.integers(min_value=1, max_value=40),  # token count
    ),
    min_size=1,
    max_size=40,
)


def _reference_pack(rows):
    """Driver-side oracle: per-stream prefix sums in doc_id order."""
    out = {}
    offsets = {}
    for doc_id, (stream, tokens) in enumerate(rows):
        start = offsets.get(stream, 0)
        out[doc_id] = (stream, tokens, start, start // BUDGET, (start + tokens - 1) // BUDGET)
        offsets[stream] = start + tokens
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_strategy, st.integers(min_value=1, max_value=7))
def test_pack_offsets_match_prefix_sum_oracle(spark, rows, nparts):
    df = spark.createDataFrame(
        [(i, s, t) for i, (s, t) in enumerate(rows)], "doc_id long, stream string, n_tokens long"
    ).repartition(nparts)
    got = {
        r.doc_id: (r.stream, r.n_tokens, r.start_offset, r.pack_id, r.end_pack)
        for r in pack_offsets(
            df, tokens_col="n_tokens", order_col="doc_id", stream_col="stream", budget=BUDGET
        ).collect()
    }
    assert got == _reference_pack(rows)

    # contiguity: per stream, pack ids are exactly 0..max
    by_stream = {}
    for stream, _, _, pack_id, end_pack in got.values():
        by_stream.setdefault(stream, set()).update(range(pack_id, end_pack + 1))
    for packs in by_stream.values():
        assert packs == set(range(max(packs) + 1))
