"""Operator modules of the extension surface (SURVEY.md §2.4).

Each module exposes:
- ``QUERIES``: dict[name, Callable[(SparkSession, sf_dir), DataFrame]]
- ``ORACLE``:  dict[name, str] — DuckDB-runnable ANSI SQL equivalents
  (omitted for non-SQL-expressible ops; the driver then records a weaker
  rows-only check).

``all_queries()`` / ``all_oracle()`` merge them for ``__spark_entry__``.
"""

from __future__ import annotations

from ts_etl_spark.operators import (
    advanced,
    dedup,
    events,
    multimodal,
    relational,
    similarity,
    textops,
)

_MODULES = (relational, advanced, events, dedup, similarity, textops, multimodal)


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracle():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
