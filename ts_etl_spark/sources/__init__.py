"""Source adapters + registry.

Mirrors the reference's parser registry (src/parsers/index.ts:8-31, operator
O19): a plain dict mapping input-type name -> reader callable, with
``register_source`` warning on overwrite and ``create_source`` raising on
unknown types.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ts_etl_spark.sources.csv_source import read_csv
from ts_etl_spark.sources.jsonl_source import read_jsonl
from ts_etl_spark.sources.prn_source import read_prn
from ts_etl_spark.sources.tables import load_table, load_tables

SourceFn = Callable[..., DataFrame]

SOURCES: dict[str, SourceFn] = {
    "csv": read_csv,
    "prn": read_prn,
    # extension format (no reference counterpart; SURVEY §2.3 registry point)
    "jsonl": read_jsonl,
}


def register_source(name: str, fn: SourceFn) -> None:
    """Plugin point for new formats (reference parsers/index.ts:11-16)."""
    key = name.lower()
    if key in SOURCES:
        print(f"Warning: Overwriting existing parser for type: {key}", file=sys.stderr)
    SOURCES[key] = fn


def create_source(name: str, spark: SparkSession, path: str, **options) -> DataFrame:
    """Reader lookup (reference parsers/index.ts:22-31)."""
    key = name.lower()
    if key not in SOURCES:
        raise ValueError(f"No parser registered for input type: {name}")
    return SOURCES[key](spark, path, **options)


__all__ = [
    "SOURCES",
    "register_source",
    "create_source",
    "read_csv",
    "read_jsonl",
    "read_prn",
    "load_table",
    "load_tables",
]
