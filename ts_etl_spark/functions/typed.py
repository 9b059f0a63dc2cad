"""Typed-core conversion ("typed core, formatted edges", SURVEY.md §7.1).

The parity path keeps the reference's all-strings model
(normalization.ts:3); the relational surface works on validated types. The
two are bridged here:

- ``to_typed``: canonical strings → ``CANONICAL_TYPED_SCHEMA``. Birthday
  uses STRICT ``to_date`` — values the reference passed through verbatim
  (unknown formats, impossible dates like ``1999-99-99``) become null; this
  is the documented divergence between the parity path and the typed path
  (SURVEY.md §7.4 hard part 2).
- ``from_typed``: typed → canonical strings, reproducing the exact sink
  formats (2-decimal money, ISO dates, '' for nulls).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ts_etl_spark.schema import (
    EXPECTED_HEADERS,
    H_ADDRESS,
    H_BIRTHDAY,
    H_CREDIT_LIMIT,
    H_NAME,
    H_PHONE,
    H_POSTCODE,
    ROW_ID,
)

_TYPED_NAMES = {
    H_NAME: "name",
    H_ADDRESS: "address",
    H_POSTCODE: "postcode",
    H_PHONE: "phone",
    H_CREDIT_LIMIT: "credit_limit",
    H_BIRTHDAY: "birthday",
}


def to_typed(df: DataFrame) -> DataFrame:
    """Canonical normalized string frame → typed frame."""
    exprs = []
    if ROW_ID in df.columns:
        exprs.append(F.col(ROW_ID))
    for h in EXPECTED_HEADERS:
        c = F.col(f"`{h}`")
        out = _TYPED_NAMES[h]
        if h == H_CREDIT_LIMIT:
            exprs.append(c.try_cast(T.DecimalType(18, 2)).alias(out))
        elif h == H_BIRTHDAY:
            # strict parse; '' / pass-through garbage / impossible dates →
            # null (try_to_date never raises, even under ANSI mode)
            exprs.append(
                F.when(
                    c.rlike(r"^\d{4}-\d{2}-\d{2}$"), F.try_to_date(c, "yyyy-MM-dd")
                )
                .otherwise(F.lit(None).cast(T.DateType()))
                .alias(out)
            )
        else:
            exprs.append(c.alias(out))
    return df.select(exprs)


def from_typed(df: DataFrame) -> DataFrame:
    """Typed frame → canonical string frame (sink-ready formats)."""
    exprs = []
    if ROW_ID in df.columns:
        exprs.append(F.col(ROW_ID))
    for h in EXPECTED_HEADERS:
        src = _TYPED_NAMES[h]
        c = F.col(src)
        if h == H_CREDIT_LIMIT:
            exprs.append(
                F.coalesce(c.cast(T.StringType()), F.lit("0.00")).alias(h)
            )
        elif h == H_BIRTHDAY:
            exprs.append(
                F.coalesce(F.date_format(c, "yyyy-MM-dd"), F.lit("")).alias(h)
            )
        else:
            exprs.append(F.coalesce(c, F.lit("")).alias(h))
    return df.select(exprs)
