"""Golden tests for the field normalizers.

Cases lifted from reference tests/parsers/csvParser.test.ts,
tests/parsers/prnParser.test.ts and src/utils/normalization.ts behavior
(FIXTURES.md §4/§5).
"""

import pytest
from pyspark.sql import functions as F

from ts_etl_spark.functions.normalize import (
    normalize_birthday,
    normalize_field,
    normalize_money,
    normalize_phone,
    normalize_postcode,
)
from ts_etl_spark.schema import EXPECTED_HEADERS, H_BIRTHDAY, H_CREDIT_LIMIT


def _apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r[0] for r in df.select(fn(F.col("v")).alias("out")).collect()]


POSTCODE_CASES = [
    ("3122gg", "3122GG"),
    ("4532 AA", "4532AA"),
    ("3423 ba", "3423BA"),
    ("  2340 CC  ", "2340CC"),
    ("87823", "87823"),
]

PHONE_CASES = [
    ("020 3849381", "0203849381"),
    ("+44 728 889838", "+44728889838"),
    ("0313-398475", "0313398475"),
    ("06-28938945", "0628938945"),
    ("  0885-291029 ", "0885291029"),
]

MONEY_CASES = [
    ("10000", "10000.00"),
    ("109093", "109093.00"),
    ("54.5", "54.50"),
    ("63.6", "63.60"),
    ("9898.3", "9898.30"),
    ("54,5", "54.50"),  # comma decimal separator (normalization.ts:61)
    ("NOTANUMBER", "0.00"),
    ("", "0.00"),
    ("  934  ", "934.00"),
    ("-12.345", "-12.35"),  # HALF_UP on the decimal string
    ("1e3", "1000.00"),
    (".5", "0.50"),
]

BIRTHDAY_CASES = [
    ("01/01/1987", "1987-01-01"),
    ("03/12/1965", "1965-12-03"),
    ("1/2/1987", "1987-02-01"),  # 1-digit day/month padded
    ("19870101", "1987-01-01"),
    ("19991213", "1999-12-13"),
    ("2000-1-5", "2000-01-05"),  # loose ISO re-padded (E18)
    ("2000-01-05", "2000-01-05"),
    ("99/99/1999", "1999-99-99"),  # NO calendar validation — digits rearranged
    ("Jan 5 2000", "Jan 5 2000"),  # unknown format passes through (E19)
    ("", ""),
]


def test_postcode(spark):
    ins, outs = zip(*POSTCODE_CASES)
    assert _apply(spark, normalize_postcode, ins) == list(outs)


def test_phone(spark):
    ins, outs = zip(*PHONE_CASES)
    assert _apply(spark, normalize_phone, ins) == list(outs)


def test_money(spark):
    ins, outs = zip(*MONEY_CASES)
    assert _apply(spark, normalize_money, ins) == list(outs)


def test_birthday(spark):
    ins, outs = zip(*BIRTHDAY_CASES)
    assert _apply(spark, normalize_birthday, ins) == list(outs)


def test_name_address_trim_only(spark):
    vals = ["  Johnson, John  ", "Børkestraße 32", "   "]
    got = _apply(spark, lambda c: normalize_field("Name", c), vals)
    assert got == ["Johnson, John", "Børkestraße 32", ""]


@pytest.mark.parametrize(
    "header,expected",
    [(H_CREDIT_LIMIT, "0.00")] + [(h, "") for h in EXPECTED_HEADERS if h != H_CREDIT_LIMIT],
)
def test_null_defaults(spark, header, expected):
    df = spark.createDataFrame([(None,)], "v string")
    got = df.select(normalize_field(header, F.col("v")).alias("o")).collect()[0][0]
    assert got == expected


def test_case_insensitive_header_dispatch(spark):
    # "credit limit" (lowercase) must hit the money rule (normalization.ts:37-42)
    df = spark.createDataFrame([("54.5",)], "v string")
    got = df.select(normalize_field("credit limit", F.col("v")).alias("o")).collect()[0][0]
    assert got == "54.50"


def test_register_normalizer_extension(spark, capsys):
    """User-defined scalar rule registry (extension of the reference's
    O19/O20 registry idiom to normalization rules)."""
    from pyspark.sql import functions as F2

    from ts_etl_spark.functions import normalize as nz

    nz.register_normalizer("Loyalty Tier", lambda c: F2.upper(nz.js_trim(c)), default="NONE")
    try:
        df = spark.createDataFrame([(" gold ",), (None,)], "v string")
        got = [
            r[0]
            for r in df.select(nz.normalize_field("Loyalty Tier", F2.col("v")).alias("o")).collect()
        ]
        assert got == ["GOLD", "NONE"]
        # overwrite warns, mirroring the reference registries
        nz.register_normalizer("Loyalty Tier", nz.js_trim)
        assert "Overwriting normalizer" in capsys.readouterr().err
    finally:
        nz._RULES.pop("Loyalty Tier", None)
        nz.DEFAULTS.pop("Loyalty Tier", None)
