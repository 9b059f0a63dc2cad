"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (reference-parity surface is
exercised via tests/, extension surface here — exactly 50 entries so the
driver's CORRECTNESS sweep covers all of them in one pass); ``oracle_sql()``
gives a DuckDB equivalent for EVERY entry — engine-specific sketches are
expressed through engine-portable constructions (md5-derived simhash,
exact-match HLL registers, deterministic IVF cell assignment) or
bounded-error booleans the oracle asserts TRUE (quantiles_sketches), so
nothing falls back to rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ts_etl_spark.operators import all_oracle, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    from ts_etl_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracle()
