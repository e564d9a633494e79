"""CSV / JSONL source round-trips and quarantine semantics."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.filesources import (
    CORRUPT_COL,
    read_csv,
    read_jsonl,
    split_quarantine,
)
from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
    load_table,
)

SF_DIR = "/root/testdata/sf0.001"

SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, orders, tmp_path):
    p = str(tmp_path / "orders_csv")
    orders.write.option("header", True).csv(p)
    back = read_csv(spark, p, SCHEMA).drop(CORRUPT_COL)
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_jsonl_roundtrip(spark, orders, tmp_path):
    p = str(tmp_path / "orders_json")
    orders.write.json(p)
    back = read_jsonl(spark, p, SCHEMA).drop(CORRUPT_COL)
    assert _sorted_rows(back) == _sorted_rows(orders)


def test_csv_quarantines_malformed_rows(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "o_orderkey,o_custkey,o_totalprice,o_orderpriority\n"
        "1,10,99.5,1-URGENT\n"
        "not-a-number,20,50.0,2-HIGH\n"
        "3,30,12.25,3-MEDIUM\n"
    )
    clean, bad = split_quarantine(read_csv(spark, str(p), SCHEMA))
    assert clean.count() == 2
    assert bad.count() == 1
    assert "not-a-number" in bad.collect()[0][0]
    # clean side has the corrupt column dropped
    assert CORRUPT_COL not in clean.columns


def test_jsonl_quarantines_malformed_rows(spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text(
        '{"o_orderkey": 1, "o_custkey": 10, "o_totalprice": 99.5, "o_orderpriority": "1-URGENT"}\n'
        "this is not json\n"
        '{"o_orderkey": 3, "o_custkey": 30, "o_totalprice": 12.25, "o_orderpriority": "3-MEDIUM"}\n'
    )
    clean, bad = split_quarantine(read_jsonl(spark, str(p), SCHEMA))
    assert clean.count() == 2
    assert bad.count() == 1


def test_csv_reader_keeps_pruning(spark, orders, tmp_path):
    # projecting two columns must not read the corrupt col path into
    # the result schema
    p = str(tmp_path / "orders_csv2")
    orders.write.option("header", True).csv(p)
    two = read_csv(spark, p, SCHEMA).select("o_orderkey", "o_totalprice")
    assert two.columns == ["o_orderkey", "o_totalprice"]
    assert two.count() == orders.count()


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.filesources import (
        read_orc,
        write_orc,
    )
    from data_warehouse_and_bi_dashboards_for_iowa_alcoholic_beverages_division_spark.sources.tables import (
        load_table,
    )
    import contextlib
    import io

    import pyspark.sql.functions as F

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)

    back = read_orc(spark, path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()

    # predicate + projection must reach the ORC scan like parquet
    probe = back.where(F.col("o_totalprice") > 1000).select("o_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    assert "o_totalprice" in plan.split("PushedFilters")[1].split("]")[0]
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read_schema
