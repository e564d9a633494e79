"""Round-15 study: what does an in-place single-vector UPDATE cost,
vs the pre-r15 path (delete -> FULL compaction -> append), as a
function of unrelated tombstone debt?

Setup per (SF, debt) point: fresh flat build at derived capacity,
`d` unrelated scattered tombstones (vec_id % stride), then

- NEW path: ``update_in_ivf_index`` of ONE id (reversed vector) —
  micro-compaction should rewrite exactly the cells holding that id's
  old row, regardless of d;
- OLD path (fresh index, same debt): ``delete_from_ivf_index`` of the
  id, FULL ``compact_ivf_index`` (pays the whole index's debt — the
  only way to unblock the re-insert guard before r15), then
  ``append_to_ivf_index`` of the new vector.

Report wall + cells touched for both. The claim under test (r14
verdict ask #2): update cost is O(cells-of-batch), independent of
unrelated debt, while the old path's compaction degenerates toward a
full rewrite as scattered debt grows (the 1-(1-1/C)^d law from the
r14 scatter study).

Usage: python tools/study_update_cost.py [sf_dir ...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark import (  # noqa: E402
    get_spark,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.operators.similarity import (  # noqa: E402
    append_to_ivf_index,
    build_ivf_index,
    compact_ivf_index,
    delete_from_ivf_index,
    derived_n_cells,
    update_in_ivf_index,
)

SF_DIRS = sys.argv[1:] or [
    "/root/repo/.localdata/sf1.0",
    "/root/repo/.localdata/sf10",
]
UPDATE_ID = 11  # not in any tombstone stride below


def main() -> None:
    spark = get_spark("update-cost-study")
    for sf_dir in SF_DIRS:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        nc = derived_n_cells(n)
        for label, stride in [("none", None), ("~0.1%", 1000), ("~1%", 100)]:
            batch = emb.where(F.col("vec_id") == UPDATE_ID).select(
                "vec_id", F.reverse("embedding").alias("embedding")
            )
            results = {}
            for mode in ("update", "old-path"):
                # fresh dir per point, removed before the next one — an
                # unfreed index copy per point is many GB of /tmp leak
                # at sf10 (code-review r15 finding)
                root = tempfile.mkdtemp(prefix="updstudy-")
                try:
                    path = f"{root}/idx"
                    build_ivf_index(
                        emb, path, n_cells=nc, iters=2, train_where="vec_id % 16 = 0"
                    )
                    if stride is not None:
                        delete_from_ivf_index(
                            emb.where(
                                (F.col("vec_id") % stride == 3)
                                & (F.col("vec_id") != UPDATE_ID)
                            ).select("vec_id"),
                            path,
                        )
                    t0 = time.monotonic()
                    if mode == "update":
                        stats = update_in_ivf_index(batch, path)
                    else:
                        delete_from_ivf_index(batch.select("vec_id"), path)
                        stats = compact_ivf_index(spark, path)
                        append_to_ivf_index(batch, path)
                    wall = time.monotonic() - t0
                    touched = len(stats["cells_rewritten"]) + len(stats["cells_removed"])
                    results[mode] = (wall, touched, stats["rows_removed"])
                finally:
                    shutil.rmtree(root, ignore_errors=True)
            (uw, ut, ur), (ow, ot, orr) = results["update"], results["old-path"]
            print(
                f"{sf_dir.rsplit('/', 1)[-1]} n={n} cells={nc} debt={label}: "
                f"update {uw:.1f}s touching {ut} cell(s) ({ur} rows) | "
                f"old-path {ow:.1f}s touching {ot} cell(s) ({orr} rows)",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
