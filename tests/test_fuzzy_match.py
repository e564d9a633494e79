"""q152 blocking completeness: the length-band + prefix block must
find every pair within edit distance 2 whose edits fall after the
9-char prefix — including insertion/deletion dupes, which change
length and were unreachable under the old exact-length blocking."""

import pyspark.sql.functions as F

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.plans.queries import (
    registry,
)

# All share the 9-char prefix "Supplier#"; edits are after the prefix.
NAMES = [
    (1, "Supplier#000000001"),
    (2, "Supplier#00000001"),     # deletion of one '0'   (d=1, len-1)
    (3, "Supplier#0000000001"),   # insertion of one '0'  (d=1, len+1)
    (4, "Supplier#000000002"),    # substitution          (d=1, same len)
    (5, "Supplier#0001"),         # far away              (d>2)
    (6, "Supplier#000000001XY"),  # two insertions        (d=2, len+2)
    (7, "Supplier#0000001"),      # two deletions vs 1    (d=2, len-2)
    (8, "Supplier#9876543"),      # same len as 2, d>2
    (9, "Other#000000001"),       # different prefix — out of contract
]


def _naive_pairs(spark):
    """Ground truth: all-pairs Levenshtein <= 2 among same-prefix names."""
    df = spark.createDataFrame(NAMES, "s_suppkey long, s_name string")
    a = df.select(F.col("s_suppkey").alias("ka"), F.col("s_name").alias("na"))
    b = df.select(F.col("s_suppkey").alias("kb"), F.col("s_name").alias("nb"))
    rows = (
        a.crossJoin(b)
        .where(
            (F.col("ka") < F.col("kb"))
            & (F.substring("na", 1, 9) == F.substring("nb", 1, 9))
            & (F.levenshtein("na", "nb") <= 2)
        )
        .select("ka", "kb", F.levenshtein("na", "nb").alias("d"))
        .collect()
    )
    return {(r["ka"], r["kb"]): r["d"] for r in rows}


def test_blocked_match_finds_indel_pairs(spark, tmp_path):
    spark.createDataFrame(NAMES, "s_suppkey long, s_name string").write.parquet(
        str(tmp_path / "supplier.parquet")
    )
    got = {
        (r["key_a"], r["key_b"]): r["edit_distance"]
        for r in registry()["q152_fuzzy_supplier_match"].fn(spark, str(tmp_path)).collect()
    }
    want = _naive_pairs(spark)
    # sanity on the fixture itself: indel pairs exist in the truth set
    assert (1, 2) in want and (1, 3) in want and (1, 6) in want and (1, 7) in want
    assert (5, 8) not in want
    assert got == want
