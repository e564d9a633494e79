"""Registry-wide invariants (no Spark session needed).

These catch the classes of drift that individual query tests can't:
a single mistyped rounding scale in one oracle, a duplicated name, a
missing description.
"""

import re

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
    registry,
)

CANON_ROUND = "* 1000000 + 0.5) / 1000000.0"


def test_every_oracle_floor_is_the_canonical_6dp_formula():
    # The cross-engine rounding contract (functions/rounding.py) is
    # inlined in oracle SQL strings; every FLOOR there must be exactly
    # the canonical formula — a typo'd scale in one copy would be a
    # silent parity break found only when the data lands on the
    # divergent value.
    for name, spec in registry().items():
        if spec.oracle is None:
            continue
        sql = re.sub(r"\s+", " ", spec.oracle)
        # every 1e6-scaled floor must be the complete canonical form
        # (FLOOR with other scales — e.g. q105's int8 quantizer — is a
        # different operation and exempt)
        n_scaled = sql.count("* 1000000")
        n_canon = sql.count(CANON_ROUND)
        assert n_scaled == n_canon, (
            f"{name}: {n_scaled} 1e6-scaled expression(s) but {n_canon} "
            f"canonical 6dp rounding form(s) — typo'd rounding in an oracle"
        )


def test_names_are_well_formed_and_descriptions_present():
    reg = registry()
    assert len(reg) == len({s.name for s in reg.values()})
    for name, spec in reg.items():
        assert re.match(r"^q\d+_[a-z0-9_]+$", name), name
        assert spec.name == name
        assert spec.description, f"{name} has no description"


def test_rows_only_queries_are_the_known_set():
    # rows-only (no oracle) entries get a weaker driver check; keep the
    # set explicit so a dropped oracle is a conscious decision
    rows_only = {n for n, s in registry().items() if s.oracle is None}
    assert rows_only == {
        "q35_minhash_lsh",
        "q36_simhash",
        "q37_ngram_jaccard",
        "q39_knn_lsh",
        "q40_embedding_near_dup",
        "q56_approx_distinct",
        "q67_knn_ivf",
        "q71_media_resize",
        "q99_incremental_lsh",
        "q126_bpe_train",
    }


def test_readme_registry_count_is_current():
    with open("/root/repo/README.md") as f:
        m = re.search(r"(\d+)-query registry", f.read())
    assert m, "README must state the registry size"
    assert int(m.group(1)) == len(registry()), (
        f"README says {m.group(1)} queries but the registry has "
        f"{len(registry())} — update the layout overview"
    )
