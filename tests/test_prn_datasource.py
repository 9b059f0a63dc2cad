"""PRN Python DataSource (DataSource V2): schema inference, parity with
the adapter path, and byte-range split correctness on a 1000-row latin1
file."""

import pytest

from tests.test_differential_generated import _dataset, _prn_bytes
from ts_etl_spark.schema import EXPECTED_HEADERS
from ts_etl_spark.sources.prn_datasource import read_prn_format, register
from ts_etl_spark.sources.prn_source import read_prn

PRN_FIXTURE = "tests/fixtures/Workbook2.prn"


def _rows(df):
    return sorted(tuple(r[h] for h in EXPECTED_HEADERS) for r in df.collect())


def test_schema_inferred_from_header(spark):
    register(spark)
    df = spark.read.format("prn").load(PRN_FIXTURE)
    assert df.columns == list(EXPECTED_HEADERS)


def test_canonical_parity_with_adapter(spark):
    a = _rows(read_prn_format(spark, PRN_FIXTURE))
    b = _rows(read_prn(spark, PRN_FIXTURE, with_row_id=False))
    assert a == b and len(a) == 7


@pytest.fixture(scope="module")
def big_prn(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("prnds") / "big.prn"
    p.write_bytes(_prn_bytes(_dataset()))
    return str(p)


def test_split_reads_match_single_partition(spark, big_prn):
    """Every line is owned by exactly one byte-range partition: a tiny
    partition size (hundreds of splits) must reproduce the single-split
    read exactly — no lost, duplicated, or torn lines."""
    register(spark)
    one = _rows(read_prn_format(spark, big_prn))
    many_df = spark.read.format("prn").option("partitionBytes", "700").load(big_prn)
    assert many_df.rdd.getNumPartitions() > 50
    many = _rows(read_prn_format(spark, big_prn, partition_bytes=700))
    assert one == many and len(one) == 1000


def test_latin1_survives(spark, big_prn):
    rows = _rows(read_prn_format(spark, big_prn))
    assert any("ß" in r[0] or "Æ" in r[0] or "Ø" in r[0] for r in rows)
    assert all("�" not in "".join(r) for r in rows)


def test_blank_and_short_lines(spark, tmp_path):
    """Blank lines are dropped (O7); short lines yield defaults for the
    missing tail columns — the reference's permissive path."""
    p = tmp_path / "edge.prn"
    p.write_bytes(
        b"Name    Address    Postcode  Phone  Credit Limit  Birthday\n"
        b"\n"
        b"Jo      Here       1234AB\n"
        b"   \n"
        b"Ann     There      9999ZZ    123    5450          19870101\n"
    )
    rows = _rows(read_prn_format(spark, str(p)))
    assert len(rows) == 2
    by_name = {r[0]: r for r in rows}
    assert by_name["Jo"][4] == "0.00"  # missing money -> default
    assert by_name["Ann"][4] == "54.50"  # cents pre-scale
    assert by_name["Ann"][5] == "1987-01-01"


def test_empty_file(spark, tmp_path):
    p = tmp_path / "empty.prn"
    p.write_bytes(b"")
    df = read_prn_format(spark, str(p))
    assert df.count() == 0
    assert list(df.columns) == list(EXPECTED_HEADERS)
