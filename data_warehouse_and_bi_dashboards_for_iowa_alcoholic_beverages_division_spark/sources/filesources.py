"""CSV / JSON-lines file sources with scale-safe defaults.

SURVEY.md §2.1 S6: the reference lands external data through a
chunked client download (``ingest_utils.py:12-64``) with explicit
schema verification (``verifySchema=True``). On Spark the landing
formats are files; these wrappers pin the three decisions that matter
at 100 TB:

- **Explicit schema, never inference.** Schema inference is a full
  extra pass over the data (and for JSON a driver-side merge of every
  partition's sample). Callers must pass a ``StructType``.
- **PERMISSIVE with a quarantine column.** A single malformed row in
  a 100 TB load must not kill the job (FAILFAST) nor vanish silently
  (DROPMALFORMED). Bad rows land in ``_corrupt_record`` so the load
  can count / divert them (same contract as the reference's coercion
  pipeline, which nulls unparseable values).
- **Splittable inputs.** Plain CSV/JSONL splits by line; these
  readers keep the default (no multiLine), so one giant file still
  parallelizes across executors. ``multiLine=True`` would make each
  file one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema-first CSV reader; malformed rows quarantined, not fatal."""
    return (
        spark.read.format("csv")
        .schema(_with_corrupt(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Schema-first JSON-lines reader; malformed rows quarantined."""
    return (
        spark.read.format("json")
        .schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantined_raw_rows).

    Spark refuses to filter on the corrupt column alone from a raw
    file scan (it's populated only for rows it had to fully parse), so
    both branches share one cached parse — the documented pattern.
    """
    df = df.cache()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC sink (zlib default). ORC is the second columnar lakehouse
    format Spark supports natively — same predicate-pushdown and
    column-pruning contract as parquet, so warehouses that standardize
    on ORC (Hive heritage) get identical plans from this engine."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan. Schema comes from the file footer (columnar formats
    are self-describing — unlike CSV/JSONL no inference pass is
    needed); filters and projections push down exactly as for
    parquet."""
    return spark.read.orc(path)
