"""Property-based tests (hypothesis): the Column-expression normalizers must
agree with a direct Python re-implementation of the reference's JS semantics
on arbitrary inputs — not just the golden fixtures."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ts_etl_spark.functions.normalize import (
    normalize_birthday,
    normalize_phone,
    normalize_postcode,
)

# printable-ish text incl. whitespace and latin1 chars
TEXT = st.text(
    alphabet=st.characters(
        codec="latin-1", categories=("L", "N", "P", "S", "Z")
    ),
    max_size=30,
)


_WS = ' \t\n\r\x0b\x0c\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000\ufeff'
_WS_CLASS = '[\\s\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000\ufeff]'


def py_trim(s: str) -> str:
    # JS String.trim: Unicode whitespace + BOM
    return s.strip(_WS)


def py_postcode(s: str) -> str:
    return re.sub(_WS_CLASS + '+', '', py_trim(s)).upper()


def py_phone(s: str) -> str:
    t = py_trim(s)
    digits = re.sub(r"[^0-9]", "", t)
    return f"+{digits}" if t.startswith("+") else digits


def py_birthday(s: str) -> str:
    # [0-9] not \d: JS/Java \d is ASCII-only, Python regex \d is Unicode
    t = py_trim(s)
    m = re.match(r"^([0-9]{1,2})/([0-9]{1,2})/([0-9]{4})$", t)
    if m:
        return f"{m.group(3)}-{m.group(2).zfill(2)}-{m.group(1).zfill(2)}"
    m = re.match(r"^([0-9]{4})([0-9]{2})([0-9]{2})$", t)
    if m:
        return f"{m.group(1)}-{m.group(2)}-{m.group(3)}"
    m = re.match(r"^([0-9]{4})-([0-9]{1,2})-([0-9]{1,2})$", t)
    if m:
        return f"{m.group(1)}-{m.group(2).zfill(2)}-{m.group(3).zfill(2)}"
    return t


def _spark_apply(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r[0] for r in df.select(fn(F.col("v")).alias("o")).collect()]


@given(vals=st.lists(TEXT, min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_postcode_property(spark, vals):
    assert _spark_apply(spark, normalize_postcode, vals) == [py_postcode(v) for v in vals]


@given(vals=st.lists(TEXT, min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_phone_property(spark, vals):
    assert _spark_apply(spark, normalize_phone, vals) == [py_phone(v) for v in vals]


DATEISH = st.one_of(
    TEXT,
    st.from_regex(r"\d{1,2}/\d{1,2}/\d{4}", fullmatch=True),
    st.from_regex(r"\d{8}", fullmatch=True),
    st.from_regex(r"\d{4}-\d{1,2}-\d{1,2}", fullmatch=True),
)


@given(vals=st.lists(DATEISH, min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_birthday_property(spark, vals):
    assert _spark_apply(spark, normalize_birthday, vals) == [py_birthday(v) for v in vals]


def py_money(s: str) -> str:
    """JS parseFloat(v.replace(',', '.')).toFixed(2) with the engine's
    documented HALF_UP-on-decimal-string divergence (normalize.py docstring)."""
    from decimal import ROUND_HALF_UP, Decimal

    t = py_trim(s)
    t = re.sub(r"^([^,]*),", r"\1.", t, count=1)
    m = re.match(r"^[+-]?(?:[0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?|\.[0-9]+(?:[eE][+-]?[0-9]+)?)", t)
    if not m:
        return "0.00"
    raw = Decimal(m.group(0))
    # coarse out-of-range gate via float: handles arbitrarily huge exponents
    # (float overflows to inf, which compares correctly) without tripping
    # Decimal context limits; the exact boundary is the quantize check below
    if abs(float(m.group(0))) >= 1e17:
        return "0.00"
    d = raw.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    # DECIMAL(18,2) holds |v| <= 9999999999999999.99 AFTER rounding;
    # anything larger nulls in the engine -> plain "0.00" default
    if abs(d) > Decimal("9999999999999999.99"):
        return "0.00"
    out = f"{d:f}"
    # JS sign semantics: "-0.00" iff the parsed float is strictly negative
    v = float(m.group(0))
    if v < 0 and not out.startswith("-"):
        out = "-" + out
    if v >= 0 and out.startswith("-"):
        out = out[1:]
    return out


MONEYISH = st.one_of(
    TEXT,
    st.from_regex(r"[+-]?[0-9]{1,10}([.,][0-9]{1,4})?", fullmatch=True),
    st.from_regex(r"[0-9]{1,6}[eE][+-]?[0-9]{1,2}", fullmatch=True),
)


@given(vals=st.lists(MONEYISH, min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_money_property(spark, vals):
    from ts_etl_spark.functions.normalize import normalize_money

    assert _spark_apply(spark, normalize_money, vals) == [py_money(v) for v in vals]


@given(
    widths=st.lists(st.integers(min_value=0, max_value=6), min_size=6, max_size=6),
    drop=st.sets(st.integers(min_value=0, max_value=5), max_size=3),
)
@settings(max_examples=50, deadline=None)
def test_prn_span_inference_property(widths, drop):
    """For any padding widths and any subset of dropped headers, inferred
    spans must start exactly at each present header's position, be
    contiguous over present headers, and end at the trimmed line length."""
    from ts_etl_spark.schema import EXPECTED_HEADERS
    from ts_etl_spark.sources.prn_source import infer_specs

    present = [h for i, h in enumerate(EXPECTED_HEADERS) if i not in drop]
    if not present:
        return
    header = ""
    expected_starts = {}
    for i, h in enumerate(EXPECTED_HEADERS):
        if i in drop:
            continue
        expected_starts[h] = len(header)
        header += h + " " * widths[i]
    specs = infer_specs(header, warn=False)
    assert [s.name for s in specs] == present
    for s in specs:
        assert s.start == expected_starts[s.name]
    trimmed_len = len(header.rstrip())
    for a, b in zip(specs, specs[1:]):
        assert a.end == b.start
    assert specs[-1].end == trimmed_len


# --- word n-grams ---

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=0, max_size=12
)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(WORDS, min_size=1, max_size=8), n=st.integers(2, 4))
def test_ngram_array_property(spark, docs, n):
    """ngram_array == the sliding-window python reference for any token
    list, including lists shorter than n (empty result, no error)."""
    from ts_etl_spark.operators.textops import ngram_array

    texts = [(" ".join(ws),) for ws in docs]
    df = spark.createDataFrame(texts, "text STRING")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    got = [r.g for r in df.select(ngram_array(toks, n).alias("g")).collect()]
    for ws, g in zip(docs, got):
        # split("") yields [""]; mirror that exactly
        w = " ".join(ws).strip().split()
        if not w:
            w = [""]
        want = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
        assert g == want
