"""Typed-core conversion tests (SURVEY.md §7.1 'typed core, formatted
edges') and as-of join unit semantics."""

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from tests.golden import CSV_FIXTURE, GOLDEN_ROWS
from ts_etl_spark.functions.typed import from_typed, to_typed
from ts_etl_spark.schema import EXPECTED_HEADERS, ROW_ID
from ts_etl_spark.sources.csv_source import read_csv


def test_to_typed_golden(spark):
    typed = to_typed(read_csv(spark, CSV_FIXTURE)).orderBy(ROW_ID)
    first = typed.collect()[0]
    assert first.credit_limit == Decimal("10000.00")
    assert first.birthday == datetime.date(1987, 1, 1)
    assert first.name == "Johnson, John"
    assert dict(typed.dtypes)["credit_limit"] == "decimal(18,2)"
    assert dict(typed.dtypes)["birthday"] == "date"


def test_typed_roundtrip_preserves_golden(spark):
    df = read_csv(spark, CSV_FIXTURE)
    back = from_typed(to_typed(df)).orderBy(ROW_ID)
    rows = [tuple(r[h] for h in EXPECTED_HEADERS) for r in back.collect()]
    assert rows == GOLDEN_ROWS  # all golden birthdays are real dates


def test_typed_nulls_garbage_dates(spark):
    df = spark.createDataFrame(
        [("A", "B", "C", "D", "54.50", "1999-99-99"), ("E", "F", "G", "H", "0.00", "Jan 5 2000")],
        list(EXPECTED_HEADERS),
    )
    typed = to_typed(df)
    assert [r.birthday for r in typed.collect()] == [None, None]
    back = from_typed(typed)
    assert [r["Birthday"] for r in back.collect()] == ["", ""]


def test_asof_join_unit(spark):
    from ts_etl_spark.operators.advanced import asof_join

    left = spark.createDataFrame(
        [(1, 10, "L1"), (1, 20, "L2"), (2, 15, "L3")], ["k", "t", "lv"]
    )
    right = spark.createDataFrame(
        [(1, 5, "R1"), (1, 20, "R2"), (2, 99, "R3")], ["k", "t", "rv"]
    )
    out = asof_join(left, right, "k", "t", "t", ["rv"], right_tiebreak="rv")
    got = {(r.k, r.t): r.asof_rv for r in out.collect()}
    # L1@10 sees R1@5; L2@20 sees R2@20 (tie → right wins); L3@15 sees none
    assert got == {(1, 10): "R1", (1, 20): "R2", (2, 15): None}
