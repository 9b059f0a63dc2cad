"""Operator modules of the extension surface (SURVEY.md §2.4).

Each module exposes:
- ``QUERIES``: dict[name, Callable[(SparkSession, sf_dir), DataFrame]]
- ``ORACLE``:  dict[name, str] — DuckDB-runnable ANSI SQL equivalents
  (omitted for non-SQL-expressible ops; the driver then records a weaker
  rows-only check).

``all_queries()`` / ``all_oracle()`` merge them for ``__spark_entry__``.

Library-only modules (not in the 50-entry driver registry; each carries
its own DuckDB-mirror or reference-parity tests instead): ``sketches``
(mergeable HLL registers), ``packing`` (fixed-token training bins),
``bpe`` (tokenizer merge learning), ``lm`` (bigram perplexity proxy),
``drift`` (snapshot PSI), ``chunking`` (overlapping spans),
``gapfill`` (dense time grids + interpolation), ``boilerplate``
(cross-document template detection), ``skew`` (salting patterns).
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
from ts_etl_spark.pipelines import curation

# Registration order = the order the driver's CORRECTNESS sweep visits
# queries (it verifies the first 50 entries). The LLM-data-pipeline modules
# register FIRST as insurance: even if the total ever creeps past 50 again,
# dedup/similarity/text/multimodal/events keep their driver-green rows.
# (The whole surface is consolidated to ≤50 entries so every query gets a
# row in one sweep.)
_MODULES = (dedup, similarity, textops, multimodal, curation, events, relational, advanced)


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
